"""DRIVER_WINDOW rotation tool: compute the next round's 50-slot
window from the archived CORRECTNESS_r*.json ledgers, under the LRU
policy the registry comment defines (r11 capacity amendment):

    window = permanent rows-only entries
           + every query awaiting FIRST attestation
           + the STALEST attested queries by newest-successful-driver
             row (LRU), ties broken alphabetically

Run it at round start::

    python -m big_data_streaming_dashboard_spark.plans.rotation

and paste the result into ``registry.DRIVER_WINDOW`` (documenting the
picks in the rotation comment, per the r7-established practice). The
tool exists because the window is the ONE list a session edits under
arithmetic constraints every round -- r9 lost a full round to a
hand-edited window naming an unimplemented query, and the LRU math
(which block is at its 3-round staleness bound) is exactly the kind
of bookkeeping a tired session gets wrong.

Failure modes are loud: more mandatory entries (rows-only + first
attestations) than slots raises, and a window that would leave some
attested query MORE than ``max_stale_rounds`` successful rounds
without re-attestation raises -- that means coverage outgrew the
slot budget and the POLICY needs amending, which must be a human
decision, not a silent drop.
"""

from __future__ import annotations

import glob
import json
import os
import re

WINDOW_SIZE = 50
MAX_STALE_ROUNDS = 3
# A driver round only advances the LRU staleness clock when it
# completed at least this fraction of the window: a round that
# crashes after a handful of rows would otherwise count as
# "successful overall" and overstate re-attestation freshness for
# every query left out of the window (r12 ADVICE). Every historical
# completed round is 49-50/50 ok; r9 (the crash) is 0 -- 0.5 is a
# wide margin on both sides.
MIN_ROUND_COMPLETION = 0.5


def attestation_ledger(repo_root: str) -> tuple[dict[str, int], list[int]]:
    """(newest successful driver round per query, successful rounds).

    A round is successful for a query when its row ran without error
    AND either hash-matched or is a rows-only check that produced
    rows (the driver records rows-only entries with err='no_oracle').
    A round counts as successful overall only if it produced at
    least ``MIN_ROUND_COMPLETION`` x ``WINDOW_SIZE`` successful rows
    (the r9 crash produced none; a partial round that crashed
    mid-window must not advance the staleness clock for the queries
    it never reached -- r12 ADVICE). Individual successful rows from
    a partial round still update ``newest`` (they really ran)."""
    newest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        ok_count = 0
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            ran_clean = err in (None, "") or err == "no_oracle"
            ok = ran_clean and (
                row.get("hash_match") is True
                or (err == "no_oracle" and row.get("spark_rows") is not None)
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
                ok_count += 1
        if ok_count >= MIN_ROUND_COMPLETION * WINDOW_SIZE:
            rounds.append(rnd)
    return newest, sorted(rounds)


def next_window(
    repo_root: str | None = None,
    size: int = WINDOW_SIZE,
    max_stale_rounds: int = MAX_STALE_ROUNDS,
) -> list[str]:
    """The next round's DRIVER_WINDOW under the LRU policy, sorted
    within each tier (rows-only, first-attestation, stalest) the way
    the registry comment documents them."""
    from .registry import QUERIES

    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    newest, rounds = attestation_ledger(repo_root)
    newest = {n: r for n, r in newest.items() if n in QUERIES}

    rows_only = sorted(n for n, q in QUERIES.items() if not q.oracle)
    first = sorted(
        n for n, q in QUERIES.items() if q.oracle and n not in newest
    )
    mandatory = rows_only + first
    if len(mandatory) > size:
        raise RuntimeError(
            f"rotation: {len(rows_only)} rows-only + {len(first)} "
            f"first-attestation queries exceed the {size}-slot window; "
            "the policy needs a human amendment"
        )
    attested = sorted(
        (n for n in QUERIES if n in newest and n not in set(rows_only)),
        key=lambda n: (newest[n], n),
    )
    fill = attested[: size - len(mandatory)]
    window = mandatory + fill

    # staleness bound: after the next successful round, nothing left
    # OUT may fall more than max_stale_rounds successful rounds behind
    if rounds:
        left_out = attested[size - len(mandatory):]
        for n in left_out:
            # complete rounds strictly after the query's newest row,
            # plus the upcoming round. Counted (not .index()-ed):
            # a query whose only green row came from a PARTIAL round
            # has newest[n] not in `rounds`, and .index() would crash
            # the tool right when that query most needs rotating in.
            rounds_behind = sum(1 for r in rounds if r > newest[n]) + 1
            if rounds_behind > max_stale_rounds:
                raise RuntimeError(
                    f"rotation: {n} (newest row r{newest[n]}) would be "
                    f"{rounds_behind} successful rounds stale outside a "
                    f"{size}-slot window; coverage has outgrown the slot "
                    "budget -- amend the policy explicitly"
                )
    return window


if __name__ == "__main__":
    w = next_window()
    print(f"# next DRIVER_WINDOW ({len(w)} slots)")
    for name in w:
        print(f'    "{name}",')
