"""Animated GIF codec (GIF87a/GIF89a) -- pure stdlib + numpy.

Closes the VIDEO stub in the multimodal path: an animated GIF is a
real multi-frame moving-picture container, so frame sampling and
per-frame features downstream of `decode_gif` operate on genuinely
decoded pixels (LZW-decompressed, palette-resolved, composited).
Codecs that need external libraries (H.264/VP9/AV1 containers) remain
the documented stub slot.

Decoder coverage: GIF87a + GIF89a, global and local color tables,
interlaced frames, LZW with full 12-bit dictionary growth, graphic
control extensions (frame delay, transparency, disposal methods
0/1 keep, 2 restore-background, 3 restore-previous), sub-frame
regions, comment/application extensions skipped.

Encoder (test/fixture side): global palette, full-frame or sub-region
frames, optional transparency + disposal, LZW compression with
dictionary reset. Lossless by construction (palette-indexed), so
encode->decode round trips are pixel-EXACT -- stronger than the JPEG
path's tolerance tests.

Everything lives inside `gif_codec_kernel()` closures (shipped to
Spark workers by value -- executors lack this repo on PYTHONPATH),
same discipline as the PNG/WAV/JPEG kernels.

Reference parity note: the reference dashboard has no video pipeline
(SURVEY.md section 2.6); this module belongs to the training-data
extension surface.
"""

from __future__ import annotations


def gif_codec_kernel():
    """Build (decode, encode) as self-contained closures.

    decode(bytes) -> (frames, delays_cs): frames is a list of
        (H, W, 3) uint8 RGB arrays (one per frame, fully composited
        to the logical screen), delays_cs the per-frame delay in
        centiseconds (0 when absent).
    encode(frames, palette, delays_cs=None, disposal=1,
           transparent_index=None) -> bytes: frames are (H, W) uint8
        palette-index arrays, palette an (N<=256, 3) uint8 array.
    """
    import struct

    import numpy as np

    # ---- LZW ---------------------------------------------------------------

    def lzw_decode(min_code_size, data, n_expected):
        """GIF-flavor LZW: variable code width, CLEAR/EOI, 12-bit cap."""
        clear = 1 << min_code_size
        eoi = clear + 1
        out = np.empty(n_expected, dtype=np.uint8)
        n_out = 0
        # bit reader state (LSB-first per GIF spec)
        acc = 0
        nbits = 0
        pos = 0
        code_size = min_code_size + 1
        dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
        table = list(dict_base)
        prev = None
        while True:
            while nbits < code_size:
                if pos >= len(data):
                    # missing EOI: tolerate (many real encoders do)
                    return out[:n_out]
                acc |= data[pos] << nbits
                nbits += 8
                pos += 1
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(dict_base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW stream (bad first code)")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream (code gap)")
            if n_out + len(entry) > n_expected:
                entry = entry[: n_expected - n_out]  # over-long stream
            out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
            n_out += len(entry)
            if n_out >= n_expected:
                return out
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1

    def lzw_encode(min_code_size, indices):
        clear = 1 << min_code_size
        eoi = clear + 1
        out = bytearray()
        acc = 0
        nbits = 0

        def emit(code, size):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        code_size = min_code_size + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        emit(clear, code_size)
        prev = b""
        for b in bytes(indices):
            cur = prev + bytes([b])
            if cur in table:
                prev = cur
                continue
            emit(table[prev], code_size)
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
            if next_code == (1 << 12) + 1:  # dictionary full -> reset
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                code_size = min_code_size + 1
            prev = bytes([b])
        if prev:
            emit(table[prev], code_size)
        emit(eoi, code_size)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    # ---- decoder -----------------------------------------------------------

    _DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

    def decode(data):
        b = bytes(data)
        if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF (bad signature)")
        try:
            return _decode(b)
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"malformed GIF ({type(e).__name__}: {e})") from e

    def _read_color_table(b, pos, n):
        ct = np.frombuffer(b[pos : pos + 3 * n], np.uint8)
        if ct.size != 3 * n:
            raise ValueError("truncated GIF color table")
        return ct.reshape(n, 3).copy(), pos + 3 * n

    def _decode(b):
        W, H, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", b, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            gct, pos = _read_color_table(b, pos, 2 << (flags & 0x07))
        screen = np.zeros((H, W, 3), dtype=np.uint8)
        if gct is not None and bg_idx < len(gct):
            screen[:, :] = gct[bg_idx]
        frames, delays = [], []
        delay = 0
        transparent = None
        disposal = 0
        while pos < len(b):
            block = b[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = b[pos]
                pos += 1
                if label == 0xF9:  # graphic control
                    size = b[pos]
                    gflags, delay = struct.unpack_from("<BH", b, pos + 1)
                    t_idx = b[pos + 4]
                    disposal = (gflags >> 2) & 0x07
                    transparent = t_idx if gflags & 0x01 else None
                    pos += 1 + size
                    if b[pos] != 0:
                        raise ValueError("bad GIF graphic control terminator")
                    pos += 1
                else:  # comment / app / plaintext: skip sub-blocks
                    while True:
                        size = b[pos]
                        pos += 1 + size
                        if size == 0:
                            break
                continue
            if block != 0x2C:
                raise ValueError(f"unknown GIF block 0x{block:02x}")
            # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                ct, pos = _read_color_table(b, pos, 2 << (iflags & 0x07))
            if ct is None:
                raise ValueError("GIF frame without any color table")
            min_code = b[pos]
            pos += 1
            lzw = bytearray()
            while True:
                size = b[pos]
                pos += 1
                if size == 0:
                    break
                lzw += b[pos : pos + size]
                pos += size
            idx = lzw_decode(min_code, bytes(lzw), w * h)
            if idx.size < w * h:
                raise ValueError("truncated GIF frame data")
            idx = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced
                de = np.empty_like(idx)
                src = 0
                for start, step in _DEINTERLACE:
                    rows = range(start, h, step)
                    for r in rows:
                        de[r] = idx[src]
                        src += 1
                idx = de
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index outside color table")
            saved = screen.copy() if disposal == 3 else None
            region = screen[top : top + h, left : left + w]
            if region.shape[:2] != (h, w):
                raise ValueError("GIF frame region outside logical screen")
            rgb = ct[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(screen.copy())
            delays.append(int(delay))
            if disposal == 2:  # restore background in the frame region
                if gct is not None and bg_idx < len(gct):
                    region[:, :] = gct[bg_idx]
                else:
                    region[:, :] = 0
            elif disposal == 3 and saved is not None:
                screen[:, :] = saved
            disposal = 0
            transparent = None
            delay = 0
        if not frames:
            raise ValueError("GIF contains no image frames")
        return frames, delays

    # ---- encoder -----------------------------------------------------------

    def encode(
        frames,
        palette,
        delays_cs=None,
        disposal=1,
        transparent_index=None,
    ):
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("palette must be (N<=256, 3) uint8")
        frames = [np.asarray(f, dtype=np.uint8) for f in frames]
        if not frames:
            raise ValueError("need at least one frame")
        H, W = frames[0].shape
        pal_bits = max(1, int(len(pal) - 1).bit_length())
        pal_n = 1 << pal_bits
        pal_padded = np.zeros((pal_n, 3), dtype=np.uint8)
        pal_padded[: len(pal)] = pal
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", W, H, 0x80 | (pal_bits - 1), 0, 0)
        out += pal_padded.tobytes()
        delays = delays_cs or [0] * len(frames)
        min_code = max(2, pal_bits)
        for f, delay in zip(frames, delays):
            if f.shape != (H, W):
                raise ValueError("all frames must match the logical screen")
            gflags = (disposal & 0x07) << 2
            t_idx = 0
            if transparent_index is not None:
                gflags |= 0x01
                t_idx = transparent_index
            out += b"\x21\xf9\x04" + struct.pack("<BH", gflags, delay)
            out += bytes([t_idx, 0])
            out += b"\x2c" + struct.pack("<HHHHB", 0, 0, W, H, 0)
            out += bytes([min_code])
            lzw = lzw_encode(min_code, f.reshape(-1))
            for i in range(0, len(lzw), 255):
                chunk = lzw[i : i + 255]
                out += bytes([len(chunk)]) + chunk
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    return decode, encode


def make_is_gif():
    """Signature sniff (by-value for workers)."""

    def is_gif(payload) -> bool:
        head = bytes(payload[:6]) if payload is not None else b""
        return head in (b"GIF87a", b"GIF89a")

    return is_gif
