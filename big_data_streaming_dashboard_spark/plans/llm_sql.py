"""DuckDB oracle SQL for the llmdata operators.

Kept in lock-step with llmdata/{text,dedup,similarity}.py. Shared
determinism rules: md5 for all hashing (identical hex in both
engines), lexicographic min for MinHash, ordered list folds for dot
products, distinct-set sizes for Jaccard (element order never matters).
"""

from __future__ import annotations

from ..llmdata.curation import PRE_GOPHER_REASONS
from ..llmdata.dedup import DEFAULT_BAND_ROWS, DEFAULT_K
from ..llmdata.text import LANG_LEXICONS, RK_WINDOW, STOPWORDS

# shared CTE: tokens + shingles (mirrors llmdata.text.tokens / dedup.shingles)
_TOKENS_CTE = r"""
toks AS (
    SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
),
sh AS (
    SELECT doc_id, text,
        CASE WHEN len(tokens) >= 3 THEN
            list_distinct(list_filter(
                list_transform(
                    list_zip(
                        list_transform(list_zip(tokens, tokens[2:]), x -> x[1] || ' ' || x[2]),
                        tokens[3:]
                    ),
                    y -> y[1] || ' ' || y[2]
                ),
                z -> z IS NOT NULL))
        ELSE [text] END AS shingles
    FROM toks
)
"""

TOKEN_STATS_SQL = r"""
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
)
SELECT
    doc_id,
    len(tokens) AS n_tokens,
    len(list_distinct(tokens)) AS n_unique_tokens,
    round(CAST(list_aggregate(list_transform(tokens, t -> CAST(length(t) AS BIGINT)), 'sum') AS DOUBLE)
          / CAST(len(tokens) AS DOUBLE), 6) AS avg_token_len,
    md5(text) AS fingerprint
FROM toks
"""

# mirror of llmdata.text.packing_efficiency; the VALUES list is
# GENERATED from text.PACKING_SEQ_LENS at module load (the
# _sig_cols_sql pattern) so the two sides cannot drift apart by a
# hand edit that only surfaces as an oracle hash mismatch at suite
# time (r12 ADVICE)
def _packing_seq_lens_values() -> str:
    from ..llmdata.text import PACKING_SEQ_LENS

    return ", ".join(f"({int(n)})" for n in PACKING_SEQ_LENS)


PACKING_EFFICIENCY_SQL = rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
),
n AS (SELECT CAST(len(tokens) AS BIGINT) AS _n FROM toks),
per AS (
    SELECT _n, max_seq_len
    FROM n, (VALUES {_packing_seq_lens_values()}) AS t(max_seq_len)
)
SELECT max_seq_len,
       COUNT(*) AS n_docs,
       CAST(SUM(_n) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN _n < max_seq_len THEN max_seq_len - _n
                     ELSE 0 END) AS BIGINT) AS pad_tokens,
       CAST(SUM(CASE WHEN _n > max_seq_len THEN _n - max_seq_len
                     ELSE 0 END) AS BIGINT) AS truncated_tokens,
       -- UNROUNDED IEEE divisions of exact integers (bit-identical
       -- across engines); round(.,6) here hits HALF_UP-vs-shortest
       -- ties because the denominator L*n_docs is rich in 2s and 5s
       CAST(SUM(CASE WHEN _n < max_seq_len THEN max_seq_len - _n
                     ELSE 0 END) AS DOUBLE)
           / CAST(CAST(max_seq_len AS BIGINT) * COUNT(*) AS DOUBLE)
           AS pad_fraction,
       CAST(SUM(CASE WHEN _n > max_seq_len THEN _n - max_seq_len
                     ELSE 0 END) AS DOUBLE)
           / CAST(SUM(_n) AS DOUBLE) AS truncated_fraction
FROM per
GROUP BY max_seq_len
"""


# mirror of llmdata.similarity.source_drift (decimal-quantized sums,
# micro-unit means, exact int64 squared distance)
SOURCE_DRIFT_SQL = r"""
WITH ex AS (
    SELECT d.source, e.pos,
           CAST(CAST(e.val AS DOUBLE) AS DECIMAL(20,10)) AS v
    FROM (
        SELECT vec_id, unnest(embedding) AS val,
               unnest(range(len(embedding))) AS pos
        FROM embeddings
    ) e JOIN documents d ON e.vec_id = d.doc_id
),
mu AS (
    SELECT source, pos, COUNT(*) AS n_vecs,
           CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1000000)
                AS BIGINT) AS _mu
    FROM ex GROUP BY source, pos
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(MAX(a.n_vecs) AS BIGINT) AS n_a,
       CAST(MAX(b.n_vecs) AS BIGINT) AS n_b,
       CAST(CAST(SUM((a._mu - b._mu) * (a._mu - b._mu)) AS BIGINT)
            AS DOUBLE) / 1e12 AS drift_l2sq
FROM mu a JOIN mu b ON a.pos = b.pos AND a.source < b.source
GROUP BY a.source, b.source
"""


_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

QUALITY_SQL = rf"""
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
),
m AS (
    SELECT
        doc_id,
        length(text) AS text_len,
        len(tokens) AS n_tokens,
        CAST(len(list_filter(tokens, t -> lower(t) IN ({_STOP_LIST}))) AS DOUBLE)
            / CAST(len(tokens) AS DOUBLE) AS stop_ratio,
        CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
            / CAST(length(text) AS DOUBLE) AS punct_ratio,
        least(1.0, CAST(len(tokens) AS DOUBLE) / 100.0) AS len_score
    FROM toks
)
SELECT
    doc_id, text_len, n_tokens,
    round(stop_ratio, 6) AS stopword_ratio,
    round(punct_ratio, 6) AS punct_ratio,
    round(len_score * (1.0 - punct_ratio) * (0.5 + stop_ratio), 6) AS quality_score
FROM m
"""


def _lang_hits_sql() -> str:
    cols = []
    for lang, lex in LANG_LEXICONS.items():
        lst = ", ".join(f"'{w}'" for w in lex)
        cols.append(f"len(list_filter(tokens, t -> t IN ({lst}))) AS hits_{lang}")
    return ",\n        ".join(cols)


# nested-CASE expansion of the argmax loop in llmdata.text.language_id
LANGID_SQL = rf"""
WITH toks AS (
    SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS tokens
    FROM documents
),
hits AS (
    SELECT doc_id, lang AS labeled_lang,
        {_lang_hits_sql()}
    FROM toks
)
SELECT *,
    CASE WHEN hits_fr > greatest(hits_en, hits_es, hits_de) THEN 'fr'
         WHEN hits_de > greatest(hits_en, hits_es) THEN 'de'
         WHEN hits_es > hits_en THEN 'es'
         ELSE 'en' END AS predicted_lang
FROM hits
"""

EXACT_DEDUP_SQL = """
SELECT
    doc_id,
    md5(text) AS text_hash,
    COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
    MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id,
    doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
"""


def _sig_cols_sql(k: int = DEFAULT_K) -> str:
    return ",\n    ".join(
        f"list_aggregate(list_transform(shingles, s -> md5('{i}:' || s)), 'min') AS sig_{i}"
        for i in range(k)
    )


MINHASH_SQL = rf"""
WITH {_TOKENS_CTE}
SELECT doc_id,
    {_sig_cols_sql()}
FROM sh
"""


def _bands_union_sql(k: int = DEFAULT_K, band_rows: int = DEFAULT_BAND_ROWS) -> str:
    n_bands = k // band_rows
    parts = []
    for b in range(n_bands):
        cols = " || '|' || ".join(f"sig_{b * band_rows + r}" for r in range(band_rows))
        parts.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_hash FROM sig"
        )
    return "\nUNION ALL\n".join(parts)


NEARDUP_SQL = rf"""
WITH {_TOKENS_CTE},
sig AS (
    SELECT doc_id,
        {_sig_cols_sql()}
    FROM sh
),
banded AS (
{_bands_union_sql()}
),
-- bucket cap mirrors llmdata.dedup.DEFAULT_MAX_BUCKET (degenerate-band guard)
bounded AS (
    SELECT doc_id, band_idx, band_hash FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS _bucket_n
        FROM banded
    ) WHERE _bucket_n <= 1000
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b USING (band_idx, band_hash)
    WHERE a.doc_id < b.doc_id
),
pairs AS (
    SELECT
        cand.doc_a, cand.doc_b,
        round(
            CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / (CAST(len(sa.shingles) + len(sb.shingles) AS DOUBLE)
               - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)),
        6) AS jaccard
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
)
SELECT * FROM pairs WHERE jaccard >= 0.2
"""

# mirrors llmdata.dedup.source_overlap: the same verified-pair chain
# as NEARDUP_SQL, endpoints labeled with their sources, sides
# canonicalized (source_lo < source_hi), counts cast to BIGINT for
# the cross-engine type match
SOURCE_OVERLAP_SQL = f"""
SELECT source_lo, source_hi,
    CAST(COUNT(*) AS BIGINT) AS n_pairs,
    CAST(COUNT(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
    CAST(COUNT(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi
FROM (
    SELECT
        CASE WHEN da.source < db.source THEN da.source ELSE db.source END
            AS source_lo,
        CASE WHEN da.source < db.source THEN db.source ELSE da.source END
            AS source_hi,
        CASE WHEN da.source < db.source THEN p.doc_a ELSE p.doc_b END
            AS doc_lo,
        CASE WHEN da.source < db.source THEN p.doc_b ELSE p.doc_a END
            AS doc_hi
    FROM ({NEARDUP_SQL}) p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    WHERE da.source <> db.source
) sides
GROUP BY source_lo, source_hi
"""


# mirrors llmdata.dedup.ngram_jaccard_pairs: inverted shingle index,
# df cap 1000, exact list_intersect Jaccard verify at >= 0.5
NGRAM_JACCARD_SQL = rf"""
WITH {_TOKENS_CTE},
postings AS (
    SELECT doc_id, md5(s) AS sh_hash
    FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
bounded AS (
    SELECT doc_id, sh_hash FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY sh_hash) AS df FROM postings
    ) WHERE df <= 1000
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b USING (sh_hash)
    WHERE a.doc_id < b.doc_id
),
pairs AS (
    SELECT
        cand.doc_a, cand.doc_b,
        round(
            CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / (CAST(len(sa.shingles) + len(sb.shingles) AS DOUBLE)
               - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)),
        6) AS jaccard
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
)
SELECT * FROM pairs WHERE jaccard >= 0.5
"""


def _calib_match_sql(k: int = DEFAULT_K) -> str:
    return " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(k)
    )


# mirror of llmdata.dedup.minhash_calibration: exact pairs from the
# NGRAM oracle body, the m/k estimator in exact micro-units
# (1e6 divisible by k), one double division per mean at the end
MINHASH_CALIBRATION_SQL = rf"""
WITH exact AS (
{NGRAM_JACCARD_SQL}
),
{_TOKENS_CTE},
sig AS (
    SELECT doc_id,
        {_sig_cols_sql()}
    FROM sh
),
scored AS (
    SELECT CAST(floor(e.jaccard * 10) AS INTEGER) AS jbucket,
           ({_calib_match_sql()}) * {1_000_000 // DEFAULT_K} AS _est,
           abs(({_calib_match_sql()}) * {1_000_000 // DEFAULT_K}
               - CAST(round(e.jaccard * 1000000) AS BIGINT)) AS _err
    FROM exact e
    JOIN sig sa ON e.doc_a = sa.doc_id
    JOIN sig sb ON e.doc_b = sb.doc_id
)
SELECT jbucket,
       COUNT(*) AS n_pairs,
       round(CAST(SUM(_est) AS DOUBLE) / COUNT(*) / 1e6, 6)
           AS avg_estimate,
       round(CAST(SUM(_err) AS DOUBLE) / COUNT(*) / 1e6, 6)
           AS avg_abs_error
FROM scored
GROUP BY jbucket
"""


# Dedup-quality evaluator oracle (mirrors llmdata.dedup.neardup_recall):
# composes the two pair oracles above -- each independently
# hash-matched -- and buckets the SAME round(J, 6) double with IEEE
# *10/floor, so bucket labels and counts agree bit-for-bit. The LSH
# side filters the >= 0.2 output to >= threshold, exactly as the
# engine does; the exact side filters the >= 0.5 NGRAM output the
# same way (valid for threshold >= 0.5 only -- mirror of the engine's
# memoized-0.5-plan reuse), so the oracle refuses lower thresholds
# with a raise rather than silently under-reporting the exact set.
def neardup_recall_sql(threshold: float = 0.5) -> str:
    if threshold < 0.5:
        raise ValueError(
            f"neardup_recall_sql threshold {threshold} is below the fixed "
            ">= 0.5 exact-side NGRAM oracle floor; a lower threshold would "
            "silently truncate the exact pair set"
        )
    return f"""
WITH exact_pairs AS (
    SELECT * FROM (
{NGRAM_JACCARD_SQL}
    ) WHERE jaccard >= {threshold}
),
lsh_pairs AS (
    SELECT * FROM (
{NEARDUP_SQL}
    ) WHERE jaccard >= {threshold}
),
e AS (
    SELECT doc_a, doc_b, CAST(floor(jaccard * 10) AS INTEGER) AS jbucket
    FROM exact_pairs
),
ne AS (
    SELECT jbucket, COUNT(*) AS n_exact FROM e GROUP BY jbucket
),
hits AS (
    SELECT e.jbucket, COUNT(*) AS n_hit
    FROM e JOIN lsh_pairs l ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
    GROUP BY e.jbucket
)
SELECT ne.jbucket, ne.n_exact,
       COALESCE(hits.n_hit, 0) AS n_hit,
       round(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / ne.n_exact, 6) AS recall
FROM ne LEFT JOIN hits ON ne.jbucket = hits.jbucket
"""


def _simhash_bits_sql() -> str:
    terms = []
    for j in range(8):
        terms.append(
            f"(CASE WHEN 2 * len(list_filter(tokens, t -> substr(md5(t), {j + 1}, 1) >= '8'))"
            f" >= len(tokens) THEN 1 ELSE 0 END) * {1 << j}"
        )
    return " + ".join(terms)


SIMHASH_SQL = rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
)
SELECT doc_id, CAST({_simhash_bits_sql()} AS INTEGER) AS simhash8
FROM toks
"""

def bm25_topk_sql() -> str:
    """DuckDB twin of text.bm25_topk, GENERATED from the same
    BM25_QUERY_TERMS / _bm25_score_sql the Spark side uses (single
    source of truth -- the PACKING_SEQ_LENS lock-step pattern), so
    terms, parameters and the score expression cannot drift apart.
    Only the tokenize/tf plumbing differs (list_filter lambda vs
    Spark HOF); the arithmetic is the shared fragment verbatim."""
    from ..llmdata.text import BM25_QUERY_TERMS, BM25_TOP_K, _bm25_score_sql

    terms = BM25_QUERY_TERMS
    tf_proj = ",\n           ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_agg = ",\n           ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    match = " + ".join(f"tf{i}" for i in range(len(terms)))
    out_tf = ", ".join(f"tf{i} AS tf_{t}" for i, t in enumerate(terms))
    return f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
    FROM documents
), proj AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
           {tf_proj}
    FROM toks
), stats AS (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
           {df_agg}
    FROM proj
)
SELECT doc_id, dl, {out_tf},
       {_bm25_score_sql(len(terms))} AS score
FROM proj CROSS JOIN stats
WHERE ({match}) > 0
ORDER BY score DESC, doc_id
LIMIT {int(BM25_TOP_K)}
"""


def hybrid_rrf_sql() -> str:
    """DuckDB twin of similarity.hybrid_rrf_topk: the lexical CTE is
    bm25_topk_sql() VERBATIM (valid because HYBRID_FUSION_K ==
    BM25_TOP_K, asserted loudly below), the dense CTE is the
    single-query cosine ranking (same fold arithmetic as
    TOPK_COSINE_SQL), and the fusion expression is the shared
    _rrf_score_sql fragment -- ranks are integers and the reciprocal
    sum has a fixed written order, so the hash match is bit-exact by
    construction."""
    from ..llmdata.similarity import (
        HYBRID_FUSION_K,
        HYBRID_TOP_K,
        _rrf_score_sql,
    )
    from ..llmdata.text import BM25_TOP_K

    if HYBRID_FUSION_K != BM25_TOP_K:
        raise ValueError(
            "hybrid fusion list size must equal BM25_TOP_K (the lexical "
            f"CTE reuses bm25_topk_sql verbatim): {HYBRID_FUSION_K} != "
            f"{BM25_TOP_K}"
        )
    cos = _cos_expr("q.qv", "dv.v")
    return f"""
WITH lex AS (
    SELECT doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
    FROM ({bm25_topk_sql()}) bm
),
dv AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
q AS (SELECT v AS qv FROM dv WHERE vec_id = 0),
scored AS (
    SELECT dv.vec_id, {cos} AS _cos
    FROM dv CROSS JOIN q
    WHERE dv.vec_id <> 0
),
dense AS (
    SELECT vec_id AS doc_id, cos_rank FROM (
        SELECT vec_id,
            row_number() OVER (ORDER BY _cos DESC, vec_id) AS cos_rank
        FROM scored
    ) ranked WHERE cos_rank <= {int(HYBRID_FUSION_K)}
),
fused AS (
    SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
           lex_rank, cos_rank
    FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
)
SELECT doc_id, lex_rank, cos_rank, {_rrf_score_sql()} AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {int(HYBRID_TOP_K)}
"""


TFIDF_SQL = r"""
WITH term AS (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM term GROUP BY doc_id, term
),
doc_freq AS (
    SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, doc_freq.doc_freq,
           round(CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                 / CAST(doc_freq.doc_freq AS DOUBLE), 6) AS score
    FROM tf JOIN doc_freq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, doc_freq, rank, score
FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
    FROM scored
)
WHERE rank <= 3
"""

BIGRAM_LM_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
),
c_bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY w1, w2),
c_ctx AS (SELECT w1, COUNT(*) AS c_ctx FROM bg GROUP BY w1),
scored AS (
    SELECT bg.doc_id, (1000000 * c_bg.c_bg) // c_ctx.c_ctx AS p_micro
    FROM bg JOIN c_bg USING (w1, w2) JOIN c_ctx USING (w1)
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro,
       (CAST(SUM(p_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0 AS lm_score
FROM scored
GROUP BY doc_id
"""

# Rabin-Karp rolling hash (mirrors llmdata.text.rolling_fingerprint /
# repeated_passages; same M/B/W constants, same length*131+ascii codes)
_RK_CODES = r"""
codes AS (
    SELECT doc_id,
        list_transform(regexp_split_to_array(text, '\s+'),
                       t -> CAST(length(t) * 131 + ascii(t) AS BIGINT)) AS c
    FROM documents
),
win AS (
    SELECT doc_id, c,
        list_transform(generate_series(1, len(c) - 8 + 1),
            i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(c, i, i + 7)),
                             (a, x) -> (a * 1000003 + x) % 2147483647)) AS wh
    FROM codes
)
"""

ROLLING_FP_SQL = rf"""
WITH {_RK_CODES}
SELECT doc_id,
    len(c) AS n_tokens,
    list_reduce(list_prepend(CAST(0 AS BIGINT), c),
                (a, x) -> (a * 1000003 + x) % 2147483647) AS doc_fp,
    len(wh) AS n_windows
FROM win
"""

REPEATED_PASSAGES_SQL = rf"""
WITH {_RK_CODES}
SELECT passage_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM (SELECT doc_id, unnest(wh) AS passage_hash FROM win)
GROUP BY passage_hash
HAVING COUNT(DISTINCT doc_id) >= 2
"""


# mirrors llmdata.text.contamination_check (eval source 'src0',
# window 8): distinct benchmark passage-hash set, per-train-doc hit
# count, clean docs keep explicit zero
CONTAMINATION_SQL = rf"""
WITH {_RK_CODES},
tagged AS (
    SELECT w.doc_id, w.wh, d.source FROM win w JOIN documents d USING (doc_id)
),
eval_set AS (
    SELECT DISTINCT unnest(wh) AS passage_hash FROM tagged WHERE source = 'src0'
),
train AS (SELECT doc_id, wh FROM tagged WHERE source <> 'src0'),
hits AS (
    SELECT t.doc_id, COUNT(*) AS n_contaminated
    FROM (SELECT doc_id, unnest(wh) AS passage_hash FROM train) t
    JOIN eval_set USING (passage_hash)
    GROUP BY t.doc_id
)
SELECT train.doc_id,
    CAST(len(train.wh) AS BIGINT) AS n_windows,
    CAST(COALESCE(hits.n_contaminated, 0) AS BIGINT) AS n_contaminated,
    round(CASE WHEN len(train.wh) > 0
          THEN CAST(COALESCE(hits.n_contaminated, 0) AS DOUBLE)
               / CAST(len(train.wh) AS DOUBLE)
          ELSE 0.0 END, 6) AS contamination_rate,
    COALESCE(hits.n_contaminated, 0) > 0 AS is_contaminated
FROM train LEFT JOIN hits USING (doc_id)
"""

KNN_VOTE_SQL = """
WITH dv AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, v AS qv FROM dv WHERE vec_id < 5
),
scored AS (
    SELECT
        q.query_id, dv.vec_id, dv.label,
        list_reduce(list_transform(list_zip(q.qv, dv.v), p -> p[1] * p[2]), (a, b) -> a + b)
        / (sqrt(list_reduce(list_transform(list_zip(q.qv, q.qv), p -> p[1] * p[2]), (a, b) -> a + b))
           * sqrt(list_reduce(list_transform(list_zip(dv.v, dv.v), p -> p[1] * p[2]), (a, b) -> a + b)))
        AS _cos
    FROM dv CROSS JOIN q
    WHERE dv.vec_id <> q.query_id
),
topk AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY _cos DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 5
),
votes AS (
    SELECT query_id, label, COUNT(*) AS votes FROM topk GROUP BY query_id, label
)
SELECT query_id, label AS predicted_label, votes
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS _r
    FROM votes
) WHERE _r = 1
"""

def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def neardup_emb_sql(
    planes: tuple, bands: int, rows_per_band: int, threshold: float = 0.5
) -> str:
    """Embedding near-dup oracle: banded multi-bit SimHash signatures
    from literal planes, ANY-band self-join, exact cosine verify
    (mirrors llmdata.similarity.embedding_neardup_pairs: same plane
    doubles, same left-fold dot order, same s = s*2 + bit fold)."""
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
        " (x, y) -> x + y)"
    )
    sig_cols = []
    for band in range(bands):
        sig = "0"
        for plane in planes[band * rows_per_band : (band + 1) * rows_per_band]:
            d = dot.format(a="v", b=_plane_literal(list(plane)))
            sig = f"({sig}) * 2 + (CASE WHEN {d} >= 0 THEN 1 ELSE 0 END)"
        sig_cols.append(f"{sig} AS s{band}")
    any_band = " OR ".join(f"a.s{b} = b.s{b}" for b in range(bands))
    cos = (
        f"{dot.format(a='a.v', b='b.v')} / "
        f"(sqrt({dot.format(a='a.v', b='a.v')}) * sqrt({dot.format(a='b.v', b='b.v')}))"
    )
    return f"""
WITH dv AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
sigs AS (
    SELECT vec_id, v, {", ".join(sig_cols)} FROM dv
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cos}, 6) AS cos_sim
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id AND ({any_band})
WHERE round({cos}, 6) >= {threshold}
"""


_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
    " (x, y) -> x + y)"
)


def _cos_expr(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


# the plain-corpus dv CTE every cosine top-k variant specializes
_TOPK_DV_PLAIN = """dv AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
)"""


def _topk_cosine_skeleton_sql(dv_cte: str) -> str:
    """The exact-cosine per-query top-k skeleton over ANY CTE chain
    whose final relation is dv(vec_id, label, v): queries are
    vec_id < 5, ranking is (_cos DESC, vec_id), rank <= 10. Defined
    ONCE so the bit-exactness-load-bearing fold (written association
    order) and the (5, 10) literals the recall guards protect exist
    in exactly one place -- TOPK_COSINE_SQL, the matryoshka slice
    variant and the quantized-code variant all specialize this by
    swapping the dv chain."""
    cos = _cos_expr("q.qv", "dv.v")
    return f"""
WITH {dv_cte},
q AS (
    SELECT vec_id AS query_id, v AS qv FROM dv WHERE vec_id < 5
),
scored AS (
    SELECT
        q.query_id, dv.vec_id, dv.label,
        {cos} AS _cos
    FROM dv CROSS JOIN q
    WHERE dv.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY _cos DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= 10
"""


TOPK_COSINE_SQL = _topk_cosine_skeleton_sql(_TOPK_DV_PLAIN)


def _hamming_cand_cte(planes: tuple, radius: int, n_queries: int) -> str:
    """The shared Hamming-radius candidate CTE chain (dv -> sigs -> q
    -> cand) used by `hamming_topk_sql` and `rerank_topk_sql`: sign
    bits from the SAME literal planes, bit-difference fold, radius
    prefilter. cand carries (query_id, vec_id, label, qv, v)."""
    bit_exprs = ", ".join(
        f"(CASE WHEN {_DOT.format(a='v', b=_plane_literal(list(p)))} >= 0"
        " THEN 1 ELSE 0 END)"
        for p in planes
    )
    ham = (
        "list_reduce(list_transform(list_zip(s.bits, q.qbits),"
        " p -> CASE WHEN p[1] <> p[2] THEN 1 ELSE 0 END), (x, y) -> x + y)"
    )
    return f"""
WITH dv AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
sigs AS (
    SELECT vec_id, label, v, [{bit_exprs}] AS bits FROM dv
),
q AS (
    SELECT vec_id AS query_id, v AS qv, bits AS qbits
    FROM sigs WHERE vec_id < {n_queries}
),
cand AS (
    SELECT q.query_id, s.vec_id, s.label, q.qv, s.v
    FROM sigs s CROSS JOIN q
    WHERE s.vec_id <> q.query_id AND {ham} <= {radius}
)"""


def hamming_topk_sql(
    planes: tuple, radius: int, n_queries: int = 5, k: int = 10
) -> str:
    """SimHash Hamming-radius ANN oracle (mirrors
    llmdata.similarity.simhash_hamming_topk): per-vector sign bits
    from the SAME literal planes (sign margins on the fixture are
    >=3e-6 -- ten orders above float64 fold noise, so the engine's
    BLAS-batched signs and this left-fold agree bit-for-bit; pinned by
    tests), Hamming distance as the bit-difference fold, radius
    prefilter, exact cosine re-rank. Deterministic end-to-end -- the
    'approximation' is a fixed function of the planes, shared by both
    engines, so the pairing is exact."""
    return f"""
{_hamming_cand_cte(planes, radius, n_queries)},
scored AS (
    SELECT query_id, vec_id, label, {_cos_expr('qv', 'v')} AS _cos FROM cand
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY _cos DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


def rerank_topk_sql(
    planes: tuple,
    radius: int,
    weights: tuple,
    n_queries: int = 5,
    k: int = 5,
) -> str:
    """Retrieve-then-rerank oracle (mirrors
    llmdata.similarity.cross_encoder_rerank's DEFAULT scorer, r8):
    the same Hamming-radius candidate CTE as `hamming_topk_sql`, then
    the deterministic bilinear kernel sigmoid(q . W . c) with W's
    float64 values embedded as literals (`cross_encoder_weights` --
    the same literal-sharing discipline as the plane pairings). z is
    a left-fold: sum_i qv[i] * dot(W_i, v). The engine computes the
    same real number via batched einsum; both quantize at 6 decimals
    BEFORE ranking, and the fixture's distance-to-rounding-boundary
    margin (>= ~1e-8, pinned by test_ann.test_rerank_rounding_margins)
    is orders above the ~1e-14 reassociation + libm-exp noise, so the
    rounded scores -- and therefore the (score DESC, vec_id) ranks --
    match exactly. The injectable-model path stays rows-only."""
    z = " + ".join(
        f"qv[{i + 1}] * ({_DOT.format(a=_plane_literal(list(w_row)), b='v')})"
        for i, w_row in enumerate(weights)
    )
    return f"""
{_hamming_cand_cte(planes, radius, n_queries)},
scored AS (
    SELECT query_id, vec_id, label,
        round(1.0 / (1.0 + exp(-({z}))), 6) AS rerank_score
    FROM cand
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rerank_score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, rerank_score
FROM ranked WHERE rank <= {k}
"""


def lsh_topk_sql(
    planes: tuple,
    bands: int,
    rows_per_band: int,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """Banded multi-bit LSH ANN oracle (mirrors
    llmdata.similarity.lsh_banded_topk with multiprobe=True): per-band
    signatures via the same s = s*2 + bit fold over the SAME literal
    planes; the engine's probe set {{qsig}} U {{qsig XOR (1<<j)}} is
    exactly 'band-signature Hamming distance <= 1', expressed here as
    bit_count(xor(sig, qsig)) <= 1 on ANY band; candidates dedup then
    exact cosine re-rank. Deterministic for the same reason as
    `hamming_topk_sql`."""
    sig_cols, qsig_cols = [], []
    for band in range(bands):
        sig = "0"
        for plane in planes[band * rows_per_band : (band + 1) * rows_per_band]:
            d = _DOT.format(a="v", b=_plane_literal(list(plane)))
            sig = f"({sig}) * 2 + (CASE WHEN {d} >= 0 THEN 1 ELSE 0 END)"
        sig_cols.append(f"{sig} AS s{band}")
        qsig_cols.append(f"s{band} AS qs{band}")
    any_band = " OR ".join(
        f"bit_count(xor(s.s{b}, q.qs{b})) <= 1" for b in range(bands)
    )
    return f"""
WITH dv AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
sigs AS (
    SELECT vec_id, label, v, {", ".join(sig_cols)} FROM dv
),
q AS (
    SELECT vec_id AS query_id, v AS qv, {", ".join(qsig_cols)}
    FROM sigs WHERE vec_id < {n_queries}
),
cand AS (
    SELECT DISTINCT q.query_id, s.vec_id
    FROM sigs s CROSS JOIN q
    WHERE s.vec_id <> q.query_id AND ({any_band})
),
scored AS (
    SELECT c.query_id, c.vec_id, s.label, {_cos_expr('q.qv', 's.v')} AS _cos
    FROM cand c
    JOIN sigs s ON s.vec_id = c.vec_id
    JOIN q ON q.query_id = c.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY _cos DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


def ann_recall_sql(
    planes: tuple,
    bands: int,
    rows_per_band: int,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """ANN recall@k oracle (mirrors llmdata.similarity.ann_recall):
    composes the exact-cosine and banded-LSH top-k oracles -- each
    already independently hash-matched (`emb_topk_cosine`,
    `emb_lsh_topk`) -- as nested-WITH CTEs, then per-query
    n_hit = |approx INTERSECT exact| on vec_id and
    recall_at_k = n_hit / n_exact. Exactness inherits from the
    constituents: both rankings are deterministic functions of the
    SAME literal planes with quantize-before-rank and (score DESC,
    vec_id) tie order, so the id sets -- and hence the intersection
    counts -- are identical across engines."""
    # TOPK_COSINE_SQL is the fixed (5, 10) exact oracle; refuse a
    # parameterization it cannot mirror rather than silently diverge.
    # raise, not assert: an assert is stripped under `python -O` and
    # the mismatch would then silently emit a diverging oracle
    if (n_queries, k) != (5, 10):
        raise ValueError(
            f"ann_recall_sql exact-side oracle is fixed at (5, 10); "
            f"got ({n_queries}, {k})"
        )
    approx = lsh_topk_sql(planes, bands, rows_per_band, n_queries, k)
    return _recall_compose_sql(approx)


def _recall_compose_sql(approx_sql: str) -> str:
    """The shared recall@k composition skeleton: exact side is always
    the fixed TOPK_COSINE_SQL; the approximate side is any
    already-oracle-paired per-query top-k (banded LSH for
    `ann_recall_sql`, multi-probe IVF for `ivf_recall_sql`)."""
    return f"""
WITH exact_topk AS (
{TOPK_COSINE_SQL}
),
approx_topk AS (
{approx_sql}
),
ne AS (
    SELECT query_id, COUNT(*) AS n_exact FROM exact_topk GROUP BY query_id
),
na AS (
    SELECT query_id, COUNT(*) AS n_approx FROM approx_topk GROUP BY query_id
),
hits AS (
    SELECT e.query_id, COUNT(*) AS n_hit
    FROM exact_topk e
    JOIN approx_topk a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id
)
SELECT ne.query_id, ne.n_exact,
       COALESCE(na.n_approx, 0) AS n_approx,
       COALESCE(hits.n_hit, 0) AS n_hit,
       round(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / ne.n_exact, 6)
           AS recall_at_k
FROM ne
LEFT JOIN na ON ne.query_id = na.query_id
LEFT JOIN hits ON ne.query_id = hits.query_id
"""


def _topk_cosine_trunc_sql(d: int) -> str:
    """The cosine skeleton with both sides sliced to the first ``d``
    dimensions (DuckDB 1-based inclusive list slicing) -- the
    truncated ranking for matryoshka_recall_sql. Same fold, same tie
    order; only the dv chain differs."""
    return _topk_cosine_skeleton_sql(
        f"""dv AS (
    SELECT vec_id, label, list_transform(embedding[1:{d}], x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
)"""
    )


def matryoshka_recall_sql(n_queries: int = 5, k: int = 10) -> str:
    """Matryoshka truncation-recall oracle (mirrors
    llmdata.similarity.matryoshka_recall): one recall composition per
    truncation width (the shared _recall_compose_sql skeleton over
    the sliced cosine ranking), UNION ALL'd with the trunc_dim
    label. Widths are read from MATRYOSHKA_TRUNC_DIMS at module load
    (the PACKING_SEQ_LENS lock-step pattern)."""
    from ..llmdata.similarity import MATRYOSHKA_TRUNC_DIMS

    if (n_queries, k) != (5, 10):
        raise ValueError(
            f"matryoshka_recall_sql exact-side oracle is fixed at "
            f"(5, 10); got ({n_queries}, {k})"
        )
    parts = [
        f"SELECT {int(d)} AS trunc_dim, * FROM (\n"
        f"{_recall_compose_sql(_topk_cosine_trunc_sql(int(d)))}\n) t{int(d)}"
        for d in MATRYOSHKA_TRUNC_DIMS
    ]
    return "\nUNION ALL\n".join(parts)


def _topk_cosine_quant_sql(max_code: int) -> str:
    """The cosine skeleton over symmetric quantized CODE vectors
    (scale = amax/max_code, round_even like QUANTIZE_INT8_SQL; cosine
    is per-vector scale-invariant so codes rank identically to
    dequantized reconstructions) -- the approximate ranking for
    quant_recall_sql. Same fold, same tie order; only the dv chain
    differs."""
    return _topk_cosine_skeleton_sql(
        f"""dv0 AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
s AS (
    SELECT vec_id, label, v,
        list_max(list_transform(v, x -> abs(x))) AS amax
    FROM dv0
),
dv AS (
    SELECT vec_id, label,
        CASE WHEN amax > 0 THEN
            list_transform(v, x -> CAST(round_even(x / (amax / {float(max_code)!r}), 0) AS DOUBLE))
        ELSE list_transform(v, x -> CAST(0 AS DOUBLE)) END AS v
    FROM s
)"""
    )


def quant_recall_sql(n_queries: int = 5, k: int = 10) -> str:
    """Quantization-recall oracle (mirrors
    llmdata.similarity.quant_recall): one recall composition per
    precision (the shared skeleton over the b-bit code ranking),
    UNION ALL'd with the bits label; the ladder is read from
    QUANT_RECALL_BITS at module load (the PACKING_SEQ_LENS
    lock-step pattern)."""
    from ..llmdata.similarity import QUANT_RECALL_BITS

    if (n_queries, k) != (5, 10):
        raise ValueError(
            f"quant_recall_sql exact-side oracle is fixed at (5, 10); "
            f"got ({n_queries}, {k})"
        )
    parts = []
    for b in QUANT_RECALL_BITS:
        max_code = (1 << (int(b) - 1)) - 1
        parts.append(
            f"SELECT {int(b)} AS bits, * FROM (\n"
            f"{_recall_compose_sql(_topk_cosine_quant_sql(max_code))}\n"
            f") q{int(b)}"
        )
    return "\nUNION ALL\n".join(parts)


def ivf_recall_sql(
    n_lists: int = 16,
    iterations: int = 3,
    n_probe: int = 2,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """IVF recall@k oracle (mirrors llmdata.similarity.ivf_recall):
    same composition as `ann_recall_sql` with the multi-probe IVF
    top-k (`ivf_topk_tuned_sql`, oracle-paired since r7) as the
    approximate side -- the n_probe/n_lists trade-off surface an
    index sweep reads next to the banding one."""
    if (n_queries, k) != (5, 10):
        raise ValueError(
            f"ivf_recall_sql exact-side oracle is fixed at (5, 10); "
            f"got ({n_queries}, {k})"
        )
    return _recall_compose_sql(
        ivf_topk_tuned_sql(n_lists, iterations, n_probe, n_queries, k)
    )


def pq_recall_sql(
    n_subspaces: int = 8,
    n_codes: int = 16,
    iterations: int = 3,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """PQ recall@k oracle (mirrors llmdata.similarity.pq_recall): the
    recall composition with the product-quantization top-k
    (`pq_topk_sql`, oracle-paired since r7) as the approximate side --
    the code-budget accuracy surface next to the banding and probe
    ones."""
    if (n_queries, k) != (5, 10):
        raise ValueError(
            f"pq_recall_sql exact-side oracle is fixed at (5, 10); "
            f"got ({n_queries}, {k})"
        )
    return _recall_compose_sql(
        pq_topk_sql(n_queries, k, n_subspaces, n_codes, iterations)
    )


# mirrors llmdata.curation.curation_pipeline: same quality formula,
# same langid argmax CASE, same exact-dedup window, same banded
# near-dup chain (incl. the 1000 bucket cap) at jaccard >= 0.5,
# keep-lowest-doc-id policy, same drop_reason precedence
CURATION_SQL = rf"""
WITH {_TOKENS_CTE},
qm AS (
    SELECT
        doc_id,
        len(tokens) AS n_tokens,
        CAST(len(list_filter(tokens, t -> lower(t) IN ({_STOP_LIST}))) AS DOUBLE)
            / CAST(len(tokens) AS DOUBLE) AS stop_ratio,
        CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
            / CAST(length(text) AS DOUBLE) AS punct_ratio,
        least(1.0, CAST(len(tokens) AS DOUBLE) / 100.0) AS len_score
    FROM toks
),
q AS (
    SELECT doc_id, n_tokens,
        round(len_score * (1.0 - punct_ratio) * (0.5 + stop_ratio), 6) AS quality_score
    FROM qm
),
ltoks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tokens
    FROM documents
),
lhits AS (
    SELECT doc_id,
        {_lang_hits_sql()}
    FROM ltoks
),
lang AS (
    SELECT doc_id,
        CASE WHEN hits_fr > greatest(hits_en, hits_es, hits_de) THEN 'fr'
             WHEN hits_de > greatest(hits_en, hits_es) THEN 'de'
             WHEN hits_es > hits_en THEN 'es'
             ELSE 'en' END AS predicted_lang
    FROM lhits
),
exact AS (
    SELECT doc_id,
        doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
    FROM documents
),
sig AS (
    SELECT doc_id,
        {_sig_cols_sql()}
    FROM sh
),
banded AS (
{_bands_union_sql()}
),
bounded AS (
    SELECT doc_id, band_idx, band_hash FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS _bucket_n
        FROM banded
    ) WHERE _bucket_n <= 1000
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b USING (band_idx, band_hash)
    WHERE a.doc_id < b.doc_id
),
near AS (
    SELECT DISTINCT cand.doc_b AS doc_id
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
    WHERE round(
            CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / (CAST(len(sa.shingles) + len(sb.shingles) AS DOUBLE)
               - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)),
        6) >= 0.5
),
verdict AS (
    SELECT
        q.doc_id, lang.predicted_lang, q.quality_score, q.n_tokens,
        CASE WHEN lang.predicted_lang <> 'en' THEN 'non_english'
             WHEN q.quality_score < 0.3 THEN 'low_quality'
             WHEN exact.is_duplicate THEN 'exact_duplicate'
             WHEN near.doc_id IS NOT NULL THEN 'near_duplicate'
        END AS drop_reason
    FROM q
    JOIN lang ON q.doc_id = lang.doc_id
    JOIN exact ON q.doc_id = exact.doc_id
    LEFT JOIN near ON q.doc_id = near.doc_id
)
SELECT *, drop_reason IS NULL AS kept FROM verdict
"""


# mirrors llmdata.text.subword_stats: same lookahead-free pre-tokenizer
# (Java regex and RE2 agree on it), same class patterns, same integer
# ceil for the ~4-chars/token estimate
SUBWORD_SQL = r"""
WITH pt AS (
    SELECT doc_id,
        list_filter(
            regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'),
            t -> regexp_matches(t, '\S')
        ) AS toks
    FROM documents
)
SELECT
    doc_id,
    len(toks) AS n_pretokens,
    len(list_filter(toks, t -> regexp_matches(t, '^ ?[A-Za-z]+$'))) AS n_word_tokens,
    len(list_filter(toks, t -> regexp_matches(t, '^ ?[0-9]+$'))) AS n_number_tokens,
    len(list_filter(toks, t -> regexp_matches(t, '^ ?[^A-Za-z0-9\s]+$'))) AS n_punct_tokens,
    CAST(list_aggregate(
        list_transform(toks, t -> (length(trim(t)) + 3) // 4), 'sum'
    ) AS BIGINT) AS est_bpe_tokens
FROM pt
"""


# mirrors llmdata.similarity.quantize_int8: scale = max|x|/127,
# round_even quantize (Spark bround), integer L1 checksum, ordered
# error folds
QUANTIZE_INT8_SQL = """
WITH dv AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
s AS (
    SELECT vec_id, v,
        list_max(list_transform(v, x -> abs(x))) AS amax
    FROM dv
),
q AS (
    SELECT vec_id, v, amax / 127.0 AS scale,
        CASE WHEN amax > 0 THEN
            list_transform(v, x -> CAST(round_even(x / (amax / 127.0), 0) AS INTEGER))
        ELSE list_transform(v, x -> 0) END AS qv
    FROM s
),
e AS (
    SELECT vec_id, scale, qv,
        list_transform(list_zip(v, qv), p -> abs(p[1] - p[2] * scale)) AS err
    FROM q
)
SELECT vec_id,
    round(scale, 9) AS scale,
    CAST(list_aggregate(list_transform(qv, x -> CAST(abs(x) AS BIGINT)), 'sum')
         AS BIGINT) AS q_l1,
    round(list_max(err), 6) AS max_abs_err,
    round(list_reduce(list_prepend(CAST(0 AS DOUBLE), err), (a, x) -> a + x)
          / len(err), 6) AS mean_abs_err
FROM e
"""


# mirrors llmdata.curation.corpus_census: the corpus datasheet --
# per (source, lang, digit-count size bucket) doc/char/token mass.
# Digit-count bucketing (length of the integer's decimal string) is
# exact on both engines; DuckDB length() returns BIGINT -> cast to
# INTEGER to match Spark's int, and the HUGEINT sums cast to BIGINT.
CORPUS_CENSUS_SQL = r"""
SELECT source, lang,
       CAST(length(CAST(n_chars AS VARCHAR)) AS INTEGER) AS size_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
           AS total_tokens
FROM documents
GROUP BY source, lang, size_bucket
"""


# mirrors llmdata.curation.corpus_mixture: per-language token mass,
# share, and sqrt-temperature sampling weight (sqrt is IEEE-correctly
# rounded in both engines; pow is not)
MIXTURE_SQL = rf"""
WITH ltoks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tokens
    FROM documents
),
lhits AS (
    SELECT doc_id,
        {{lang_hits}}
    FROM ltoks
),
base AS (
    SELECT d.doc_id,
        CASE WHEN hits_fr > greatest(hits_en, hits_es, hits_de) THEN 'fr'
             WHEN hits_de > greatest(hits_en, hits_es) THEN 'de'
             WHEN hits_es > hits_en THEN 'es'
             ELSE 'en' END AS predicted_lang,
        len(regexp_split_to_array(d.text, '\s+')) AS n_tokens
    FROM documents d JOIN lhits ON d.doc_id = lhits.doc_id
),
per AS (
    SELECT predicted_lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
    FROM base GROUP BY predicted_lang
),
shared AS (
    SELECT predicted_lang, n_docs, lang_tokens,
        CAST(lang_tokens AS DOUBLE)
            / CAST(CAST(SUM(lang_tokens) OVER () AS BIGINT) AS DOUBLE) AS p
    FROM per
),
sq AS (SELECT *, sqrt(p) AS s FROM shared)
SELECT predicted_lang, n_docs, lang_tokens,
    round(p, 6) AS token_share,
    round(s / SUM(s) OVER (), 6) AS mixture_weight
FROM sq
""".replace("{lang_hits}", _lang_hits_sql())


def stratified_sample_sql(
    rates: dict[str, float], default_rate: float = 1.0, salt: str = "sample"
) -> str:
    """Mirrors llmdata.curation.stratified_sample: same lang CASE,
    same md5 hex-prefix lexicographic compare, same rate->hex mapping."""

    def keep_expr(r: float) -> str:
        if r >= 1.0:
            return "TRUE"
        return (
            f"substr(md5('{salt}|' || CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{format(int(r * 2**32), '08x')}'"
        )

    kept = keep_expr(default_rate)
    for lang, r in sorted(rates.items()):
        kept = (
            f"CASE WHEN predicted_lang = '{lang}' THEN {keep_expr(r)} "
            f"ELSE {kept} END"
        )
    return rf"""
WITH ltoks AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tokens
    FROM documents
),
lhits AS (
    SELECT doc_id,
        {_lang_hits_sql()}
    FROM ltoks
),
base AS (
    SELECT d.doc_id,
        CASE WHEN hits_fr > greatest(hits_en, hits_es, hits_de) THEN 'fr'
             WHEN hits_de > greatest(hits_en, hits_es) THEN 'de'
             WHEN hits_es > hits_en THEN 'es'
             ELSE 'en' END AS predicted_lang,
        len(regexp_split_to_array(d.text, '\s+')) AS n_tokens
    FROM documents d JOIN lhits ON d.doc_id = lhits.doc_id
)
SELECT doc_id, predicted_lang, n_tokens, {kept} AS kept
FROM base
"""


# mirrors llmdata.curation.shard_packing (budget 4000, bucket 128):
# same pre-token estimate, per-bucket running sum over doc_id order,
# shard from the PRE-accumulation cumulative so a doc never splits
# across shards, then dense global renumbering over (bucket, local)
# -- identical to Spark's distinct-keys row_number + broadcast join.
# cum_tokens is CAST to BIGINT: DuckDB's windowed SUM(BIGINT) yields
# HUGEINT, which the driver hashes differently from Spark's BIGINT.
SHARD_PACKING_SQL = r"""
WITH pt AS (
    SELECT doc_id,
        list_filter(
            regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'),
            t -> regexp_matches(t, '\S')
        ) AS toks
    FROM documents
),
est AS (
    SELECT doc_id,
        CAST(list_aggregate(
            list_transform(toks, t -> (length(trim(t)) + 3) // 4), 'sum'
        ) AS BIGINT) AS est_bpe_tokens
    FROM pt
),
local AS (
    SELECT doc_id, est_bpe_tokens,
        doc_id // 128 AS pack_bucket,
        CAST(SUM(est_bpe_tokens) OVER (
            PARTITION BY doc_id // 128 ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        CAST(FLOOR(
            (SUM(est_bpe_tokens) OVER (
                PARTITION BY doc_id // 128 ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING)
             - est_bpe_tokens) / 4000
        ) AS INT) AS local_shard
    FROM est
)
SELECT doc_id, est_bpe_tokens, cum_tokens,
    CAST(DENSE_RANK() OVER (ORDER BY pack_bucket, local_shard) - 1 AS INT)
        AS shard_id
FROM local
"""


# mirrors llmdata.dedup.neardup_clusters: same pair chain (banding,
# bucket cap, jaccard verify), then connected components as a
# recursive transitive closure + MIN per doc -- identical labels to
# Spark's iterative min-label propagation at its fixpoint
CLUSTERS_SQL = rf"""
WITH RECURSIVE {_TOKENS_CTE},
sig AS (
    SELECT doc_id,
        {_sig_cols_sql()}
    FROM sh
),
banded AS (
{_bands_union_sql()}
),
bounded AS (
    SELECT doc_id, band_idx, band_hash FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS _bucket_n
        FROM banded
    ) WHERE _bucket_n <= 1000
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b USING (band_idx, band_hash)
    WHERE a.doc_id < b.doc_id
),
pairs AS (
    SELECT cand.doc_a, cand.doc_b
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
    WHERE round(
            CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / (CAST(len(sa.shingles) + len(sb.shingles) AS DOUBLE)
               - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)),
        6) >= 0.2
),
edges AS (
    SELECT doc_a, doc_b FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.doc_b, reach.r FROM reach JOIN edges e ON e.doc_a = reach.doc_id
),
lbl AS (
    SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size FROM lbl GROUP BY cluster_id
)
SELECT lbl.doc_id, lbl.cluster_id, sizes.cluster_size
FROM lbl JOIN sizes USING (cluster_id)
"""

# mirrors llmdata.dedup.neardup_cluster_sizes: the dedup report's
# family-size histogram -- two GROUP BYs past the clusters closure
# (the recursive CTE nests as a FROM subquery)
CLUSTER_SIZES_SQL = f"""
SELECT cluster_size, COUNT(*) AS n_clusters
FROM (
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM ({CLUSTERS_SQL}) clusters
    GROUP BY cluster_id
) per_cluster
GROUP BY cluster_size
"""



# mirrors llmdata.curation.leakage_safe_split: the same recursive-CTE
# components closure as CLUSTERS_SQL, then the md5 cluster-granular
# split draw (thresholds GENERATED from curation's constants at module
# load -- the PACKING_SEQ_LENS lock-step pattern, so a fraction edit
# on either side is structural, not a suite-time hash surprise)
def _leakage_split_sql() -> str:
    from ..llmdata.curation import SPLIT_SALT, split_hex_thresholds

    t_train, t_val = split_hex_thresholds()
    draw = f"substr(md5('{SPLIT_SALT}|' || CAST(c.cluster_id AS VARCHAR)), 1, 8)"
    return rf"""
SELECT split, lang,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM (
    SELECT d.lang, c.cluster_id,
        CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_tokens,
        CASE WHEN {draw} < '{t_train}' THEN 'train'
             WHEN {draw} < '{t_val}' THEN 'val'
             ELSE 'test' END AS split
    FROM documents d JOIN ({CLUSTERS_SQL}) c ON d.doc_id = c.doc_id
) assigned
GROUP BY split, lang
"""


LEAKAGE_SPLIT_SQL = _leakage_split_sql()


# mirrors llmdata.text.repetition_score: distinct/total rolling-hash
# windows per doc
REPETITION_SQL = rf"""
WITH {_RK_CODES}
SELECT doc_id,
    CAST(len(wh) AS BIGINT) AS n_windows,
    CAST(len(list_distinct(wh)) AS BIGINT) AS n_distinct_windows,
    round(CASE WHEN len(wh) > 0
          THEN 1.0 - CAST(len(list_distinct(wh)) AS DOUBLE)
               / CAST(len(wh) AS DOUBLE)
          ELSE 0.0 END, 6) AS repetition_rate
FROM win
"""


# mirrors llmdata.curation.curation_pipeline_extended: base verdict +
# round-3 hygiene signals, fixed precedence (eval_holdout >
# contaminated > non_english > low_quality > repetitious >
# exact_duplicate > near_duplicate)
CURATION_EXTENDED_SQL = rf"""
SELECT *, drop_reason IS NULL AS kept FROM (
    SELECT b.doc_id, b.predicted_lang, b.quality_score, b.n_tokens,
        r.repetition_rate,
        COALESCE(c.is_contaminated, FALSE) AS is_contaminated,
        CASE WHEN d.source = 'src0' THEN 'eval_holdout'
             WHEN COALESCE(c.is_contaminated, FALSE) THEN 'contaminated'
             WHEN b.drop_reason = 'non_english' THEN 'non_english'
             WHEN b.drop_reason = 'low_quality' THEN 'low_quality'
             WHEN r.repetition_rate > 0.2 THEN 'repetitious'
             WHEN b.drop_reason = 'exact_duplicate' THEN 'exact_duplicate'
             WHEN b.drop_reason = 'near_duplicate' THEN 'near_duplicate'
             END AS drop_reason
    FROM ({CURATION_SQL}) b
    JOIN ({REPETITION_SQL}) r USING (doc_id)
    LEFT JOIN ({CONTAMINATION_SQL}) c USING (doc_id)
    JOIN documents d USING (doc_id)
)
"""


def semantic_neardup_sql(
    planes: tuple, bands: int, rows_per_band: int, threshold: float = 0.5
) -> str:
    """Oracle for llmdata.dedup.semantic_neardup: the embedding
    near-dup pair query (same literal planes) aggregated to a per-doc
    keep/drop verdict joined back onto documents."""
    pairs = neardup_emb_sql(planes, bands, rows_per_band, threshold)
    return f"""
WITH pairs AS ({pairs}),
drops AS (
    SELECT vec_b AS doc_id, MIN(vec_a) AS dup_of FROM pairs GROUP BY vec_b
)
SELECT d.doc_id, d.lang, d.source,
       (drops.doc_id IS NULL) AS keep,
       drops.dup_of AS dup_of
FROM documents d LEFT JOIN drops ON d.doc_id = drops.doc_id
"""


# mirrors llmdata.text.pii_decorate + pii_redact: same decoration
# moduli, same portable regexes, same fixed replacement order (emails
# -> phones -> IPv4), each count over the previous stage's output.
# DuckDB regexp_replace needs the 'g' flag to match Spark's
# replace-all default.
PII_REDACT_SQL = r"""
WITH decorated AS (
    SELECT doc_id,
        text || CASE
            WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
            WHEN doc_id % 3 = 1 THEN ' call 555-867-5309 or 555.123.4567 today'
            ELSE ' server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 responded'
        END AS text
    FROM documents
),
s1 AS (
    SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
    FROM decorated
),
s2 AS (
    SELECT doc_id, n_emails,
        CAST(len(regexp_extract_all(t1, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
        regexp_replace(t1, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS t2
    FROM s1
),
s3 AS (
    SELECT doc_id, n_emails, n_phones,
        CAST(len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3
    FROM s2
)
SELECT doc_id, n_emails, n_phones, n_ips,
    n_emails + n_phones + n_ips AS pii_total,
    (n_emails + n_phones + n_ips) > 0 AS has_pii,
    t3 AS redacted_text
FROM s3
"""


def _pre_gopher_list() -> str:
    """The shared PRE_GOPHER_REASONS tuple as a SQL IN-list -- the
    engine ladder and this oracle interpolate the SAME constant (r7
    advice: duplicated literals could silently drift)."""
    return ", ".join(f"'{r}'" for r in PRE_GOPHER_REASONS)


def curation_full_sql(
    planes: tuple, bands: int, rows_per_band: int, threshold: float = 0.5
) -> str:
    """Oracle for curation.curation_pipeline_full: the extended
    verdict joined to the gopher battery (gopher_fail outranks the
    dedup reasons, sits below the scalar quality gate -- r7) and
    left-joined to the semantic-neardup verdict (same literal
    planes), semantic_duplicate as the lowest-precedence reason."""
    sem = semantic_neardup_sql(planes, bands, rows_per_band, threshold)
    return f"""
SELECT *, drop_reason IS NULL AS kept FROM (
    SELECT e.doc_id, e.predicted_lang, e.quality_score, e.n_tokens,
        e.repetition_rate, e.is_contaminated,
        (NOT g.keep) AS is_gopher_fail,
        (NOT s.keep) AS is_semantic_dup,
        s.dup_of,
        COALESCE(
            CASE WHEN e.drop_reason IN ({_pre_gopher_list()})
                 THEN e.drop_reason END,
            CASE WHEN NOT g.keep THEN 'gopher_fail' END,
            e.drop_reason,
            CASE WHEN NOT s.keep THEN 'semantic_duplicate' END)
            AS drop_reason
    FROM ({CURATION_EXTENDED_SQL}) e
    JOIN (SELECT doc_id, keep FROM ({GOPHER_SQL}) _g) g
        ON e.doc_id = g.doc_id
    LEFT JOIN ({sem}) s ON e.doc_id = s.doc_id
)
"""


CHUNK_SPANS_SQL = r"""
WITH t AS (
    SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS _n
    FROM documents
),
spans AS (
    SELECT doc_id,
           CAST(s / 48 AS INTEGER) AS chunk_idx,
           s AS start_token,
           least(s + 64, _n) AS end_token
    FROM t, unnest(generate_series(0, greatest(_n - 1, 0), 48)) AS u(s)
)
SELECT doc_id, chunk_idx, start_token, end_token,
       end_token - start_token AS n_chunk_tokens
FROM spans
WHERE start_token = 0 OR end_token - start_token > 16
"""


def _sql_text_literal(s: str) -> str:
    """Render a Python string as a DuckDB expression: printable-ASCII
    runs as quoted literals, everything else as chr(codepoint) -- so
    control/combining characters never appear raw in the SQL text."""
    parts, run = [], []

    def flush():
        if run:
            lit = "".join(run).replace("'", "''")
            parts.append(f"'{lit}'")
            run.clear()

    for ch in s:
        if 32 <= ord(ch) < 127:
            run.append(ch)
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return "(" + " || ".join(parts) + ")" if parts else "''"


def normalize_sql() -> str:
    """Oracle for doc_normalize (mirrors llmdata.text.normalize_text
    over normalize_decorate): same dirt constants, NFC via DuckDB
    nfc_normalize (cross-engine Unicode-table check), identical
    RE2-portable regexes with the 'g' flag (DuckDB replaces only the
    first match by default -- Spark replaces all)."""
    from ..llmdata.text import DIRT_CTRL, DIRT_NFD

    nfd = _sql_text_literal(DIRT_NFD)
    ctrl = _sql_text_literal(DIRT_CTRL)
    return rf"""
WITH dirty AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || {nfd}
                WHEN doc_id % 3 = 1 THEN text || {ctrl}
                ELSE text END AS text
    FROM documents
),
norm AS (
    SELECT doc_id,
           length(text) AS n_chars_before,
           trim(regexp_replace(regexp_replace(nfc_normalize(text),
                '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]', '', 'g'),
                '\s+', ' ', 'g')) AS norm_text
    FROM dirty
)
SELECT doc_id, norm_text, n_chars_before,
       length(norm_text) AS n_chars_after,
       n_chars_before <> length(norm_text) AS changed
FROM norm
"""


# mirrors llmdata.dedup.containment_pairs over containment_decorate:
# same excerpt derivation (first max(n/2, 3) tokens), same bounded
# inverted shingle index, DIRECTED containment inter/|sh_a| at >= 0.8
CONTAINMENT_SQL = rf"""
WITH base AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id,
           array_to_string(
               list_slice(regexp_split_to_array(text, '\s+'), 1,
                   greatest(CAST(len(regexp_split_to_array(text, '\s+')) // 2 AS INTEGER), 3)),
               ' ') AS text
    FROM documents
),
toks AS (
    SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tokens FROM base
),
sh AS (
    SELECT doc_id, text,
        CASE WHEN len(tokens) >= 3 THEN
            list_distinct(list_filter(
                list_transform(
                    list_zip(
                        list_transform(list_zip(tokens, tokens[2:]), x -> x[1] || ' ' || x[2]),
                        tokens[3:]
                    ),
                    y -> y[1] || ' ' || y[2]
                ),
                z -> z IS NOT NULL))
        ELSE [text] END AS shingles
    FROM toks
),
postings AS (
    SELECT doc_id, md5(s) AS sh_hash
    FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
bounded AS (
    SELECT doc_id, sh_hash FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY sh_hash) AS df FROM postings
    ) WHERE df <= 1000
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b USING (sh_hash)
    WHERE a.doc_id < b.doc_id
),
scored AS (
    SELECT cand.doc_a, cand.doc_b,
        round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
              / CAST(len(sa.shingles) AS DOUBLE), 6) AS _c_ab,
        round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
              / CAST(len(sb.shingles) AS DOUBLE), 6) AS _c_ba
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
)
SELECT doc_a AS contained_doc, doc_b AS container_doc, _c_ab AS containment
FROM scored WHERE _c_ab >= 0.8
UNION ALL
SELECT doc_b AS contained_doc, doc_a AS container_doc, _c_ba AS containment
FROM scored WHERE _c_ba >= 0.8
"""


# mirrors llmdata.text.gopher_rules: same metrics, same thresholds,
# ratios rounded at 6 before comparison
GOPHER_SQL = rf"""
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tokens
    FROM documents
),
m AS (
    SELECT
        doc_id,
        len(tokens) AS n_words,
        round(CAST(list_aggregate(list_transform(tokens, t -> CAST(length(t) AS BIGINT)), 'sum') AS DOUBLE)
              / len(tokens), 6) AS mean_word_len,
        round(CAST(len(regexp_split_to_array(text, '#')) - 1
                   + len(regexp_split_to_array(text, '\.\.\.')) - 1 AS DOUBLE)
              / len(tokens), 6) AS symbol_word_ratio,
        round(CAST(len(list_filter(regexp_split_to_array(text, '\n'),
                                   ln -> regexp_matches(ln, '^\s*[-*' || chr(8226) || ']')))
                   AS DOUBLE) / len(regexp_split_to_array(text, '\n')), 6)
            AS frac_bullet_lines,
        round(CAST(len(list_filter(regexp_split_to_array(text, '\n'),
                                   ln -> regexp_matches(ln, '\.\.\.\s*$')))
                   AS DOUBLE) / len(regexp_split_to_array(text, '\n')), 6)
            AS frac_ellipsis_lines,
        round(CAST(len(list_filter(tokens, t -> regexp_matches(t, '[A-Za-z]')))
                   AS DOUBLE) / len(tokens), 6) AS frac_alpha_words,
        len(list_distinct(list_filter(list_transform(tokens, t -> lower(t)),
                                      t -> t IN ({_STOP_LIST})))) AS n_distinct_stopwords
    FROM toks
)
SELECT *,
    n_words >= 50 AND n_words <= 100000 AS r1_word_count,
    mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r2_mean_word_len,
    symbol_word_ratio <= 0.1 AS r3_symbol_ratio,
    frac_bullet_lines <= 0.9 AS r4_bullet_lines,
    frac_ellipsis_lines <= 0.3 AS r5_ellipsis_lines,
    frac_alpha_words >= 0.8 AS r6_alpha_words,
    n_distinct_stopwords >= 2 AS r7_stopwords,
    (n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND symbol_word_ratio <= 0.1
        AND frac_bullet_lines <= 0.9
        AND frac_ellipsis_lines <= 0.3
        AND frac_alpha_words >= 0.8
        AND n_distinct_stopwords >= 2 AS keep
FROM m
"""


# mirrors llmdata.text.dedupe_lines over line_decorate: DuckDB's
# two-param list_filter index is 1-BASED (Spark's is 0-based, hence
# the i+1 on the Spark side)
DEDUPE_LINES_SQL = r"""
WITH dirty AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % 2 = 0
               THEN chr(10) || 'END-BOILERPLATE' || chr(10) || 'END-BOILERPLATE' || chr(10) || 'visit example dot test'
               ELSE chr(10) || 'END-BOILERPLATE' || chr(10) || 'visit example dot test' END AS text
    FROM documents
),
l AS (
    SELECT doc_id, regexp_split_to_array(text, chr(10)) AS lines FROM dirty
),
k AS (
    SELECT doc_id, lines,
           list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
    FROM l
)
SELECT doc_id,
       len(lines) AS n_lines,
       len(kept) AS n_unique_lines,
       array_to_string(kept, chr(10)) AS clean_text,
       len(lines) <> len(kept) AS changed
FROM k
"""


VOCAB_COVERAGE_SQL = r"""
WITH term AS (
    SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
),
counts AS (
    SELECT token, COUNT(*) AS n FROM term GROUP BY token
),
ranked AS (
    SELECT token, n,
           row_number() OVER (ORDER BY n DESC, token) AS rank,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
    FROM counts
)
SELECT rank, token, n,
       round(CAST(cum_n AS DOUBLE) / (SELECT CAST(SUM(n) AS DOUBLE) FROM counts), 6)
           AS cum_coverage
FROM ranked WHERE rank <= 100
"""


def _lloyd_ctes(n_lists: int, iterations: int) -> tuple[list, str]:
    """Shared unrolled-Lloyd CTE builder for the k-means-based oracles
    (ivf_topk_sql, kmeans_assign_sql): dv + c0 init + one assign CTE
    per iteration with a means CTE between them. Returns (ctes,
    final_assignment_cte_name)."""
    d2 = (
        "list_reduce(list_transform(list_zip(a.v, c.cent),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )
    # one assign CTE (against centroid table {src}) + one means CTE
    # (empty clusters keep their previous centroid, as the engine does)
    assign = (
        "{name} AS (\n"
        "    SELECT a.vec_id, a.v, c.cluster,\n"
        "           row_number() OVER (PARTITION BY a.vec_id\n"
        f"               ORDER BY {d2}, c.cluster) AS _r\n"
        "    FROM dv a CROSS JOIN {src} c\n"
        "    QUALIFY _r = 1\n"
        ")"
    )
    means = (
        "{name} AS (\n"
        "    SELECT p.cluster, coalesce(m.cent, p.cent) AS cent\n"
        "    FROM {prev} p LEFT JOIN (\n"
        "        SELECT cluster, list(m ORDER BY pos) AS cent FROM (\n"
        "            SELECT cluster, pos, avg(x) AS m FROM (\n"
        "                SELECT cluster, unnest(v) AS x,\n"
        "                       unnest(range(len(v))) AS pos\n"
        "                FROM {assigned}\n"
        "            ) GROUP BY cluster, pos\n"
        "        ) GROUP BY cluster\n"
        "    ) m USING (cluster)\n"
        ")"
    )
    ctes = [
        "dv AS (\n"
        "    SELECT vec_id, label,\n"
        "           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "    FROM embeddings\n"
        ")",
        # init: cluster index = rank of vec_id among the first n_lists
        "c0 AS (\n"
        "    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cent\n"
        f"    FROM dv WHERE vec_id < {n_lists}\n"
        ")",
    ]
    for i in range(iterations):
        ctes.append(assign.format(name=f"a{i + 1}", src=f"c{i}"))
        if i < iterations - 1:  # the last means feeds nothing
            ctes.append(
                means.format(name=f"c{i + 1}", prev=f"c{i}", assigned=f"a{i + 1}")
            )
    return ctes, f"a{iterations}"


def ivf_topk_sql(
    n_lists: int = 8,
    iterations: int = 3,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """IVF ANN oracle (mirrors llmdata.similarity.ivf_topk at
    n_probe=1): the Lloyd k-means loop is deterministic given the
    seeded init (first n_lists vectors by vec_id) and unrolls into
    `iterations` assign+means CTE pairs; with n_probe=1 the probe
    cell is simply the query's own final assignment, and the rerank
    is the exact left-fold cosine every other paired ANN query uses.

    Cross-engine stability: squared distances mirror the engine's
    left fold exactly (0.0 + d0 == d0, same association). Per-cluster
    MEANS are each engine's own avg() -- reassociation puts them
    within ~1e-13 of each other -- so assignments agree as long as
    every vector's best-vs-second-best centroid margin is orders of
    magnitude above that; pinned per embeddings fixture by
    tests/test_ann.py::test_ivf_assignment_margins. Ties break to the
    lowest cluster index on both sides (array_position-first vs
    ORDER BY d2, cluster). The cosine rerank reads RAW vectors, so
    once candidate sets agree the scores are bit-identical."""
    ctes, final = _lloyd_ctes(n_lists, iterations)
    cos = _cos_expr("q.v", "cand.v")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
q AS (
    SELECT vec_id AS query_id, v, cluster FROM {final}
    WHERE vec_id < {n_queries}
),
scored AS (
    SELECT q.query_id, cand.vec_id, dv.label, {cos} AS _cos
    FROM q
    JOIN {final} cand ON cand.cluster = q.cluster
                     AND cand.vec_id <> q.query_id
    JOIN dv ON dv.vec_id = cand.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY _cos DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""
    )


def kmeans_assign_sql(k: int = 8, iterations: int = 5) -> str:
    """Lloyd k-means assignment oracle (mirrors
    llmdata.similarity.kmeans_assign): the same unrolled loop as
    `ivf_topk_sql` -- deterministic seeded init, left-fold squared
    distances, ties to the lowest cluster -- selecting the final
    assignment directly. Same cross-engine stability argument
    (best-vs-second-best margins pinned per fixture by
    tests/test_ann.py::test_ivf_assignment_margins, which covers this
    (k, iterations) configuration too)."""
    ctes, final = _lloyd_ctes(k, iterations)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM {final}\n"
    )


def kmeans_inertia_sql(k: int = 8, iterations: int = 5) -> str:
    """Clustering-inertia oracle (mirrors
    llmdata.similarity.kmeans_inertia): the same unrolled-Lloyd final
    assignment, then micro-unit reporting centroids (DECIMAL-quantized
    component sums -> round(mean * 1e6) BIGINT -- the
    source_micro_means pattern) and an exact int64 SSE. The only
    non-integer step is the final division by 1e12, identical IEEE on
    both engines."""
    ctes, final = _lloyd_ctes(k, iterations)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
comps AS (
    SELECT cluster, pos,
           CAST(round(x * 1000000) AS BIGINT) AS xm,
           CAST(CAST(x AS DOUBLE) AS DECIMAL(20,10)) AS xd
    FROM (
        SELECT cluster, unnest(v) AS x,
               unnest(range(len(v))) AS pos
        FROM {final}
    )
),
mu AS (
    SELECT cluster, pos,
           CAST(round(CAST(SUM(xd) AS DOUBLE) / COUNT(*) * 1000000)
                AS BIGINT) AS _mu
    FROM comps GROUP BY cluster, pos
)
SELECT CAST(c.cluster AS INTEGER) AS cluster,
       CAST(SUM(CASE WHEN c.pos = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_vecs,
       CAST(CAST(SUM((c.xm - m._mu) * (c.xm - m._mu)) AS BIGINT)
            AS DOUBLE) / 1e12 AS inertia
FROM comps c JOIN mu m ON c.cluster = m.cluster AND c.pos = m.pos
GROUP BY c.cluster
"""
    )


def pq_topk_sql(
    n_queries: int = 5,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iterations: int = 3,
    dim: int = 64,
) -> str:
    """Product-quantization ANN oracle (mirrors
    llmdata.similarity.pq_topk): per-subspace Lloyd codebook training
    unrolled into assign+means CTE chains (one independent chain per
    subspace -- the engine's iteration x subspace loop factors, since
    each subspace's update reads only its own codebook), ADC scoring
    as an s-ordered fold of query-to-candidate-centroid squared
    distances, shortlist by (ADC, vec_id), exact unit-vector-dot
    rerank rounded to 6 BEFORE ranking (as the engine does).

    Unlike the IVF pairing, NO margin argument is needed: every step
    is a bit-identical IEEE sequence on both engines -- the seeds are
    the same parquet doubles through the same normalize fold
    (0.0 + x0^2 == x0^2), the means are sorted-ascending left folds
    divided by the count (Spark array_sort(collect_list) == DuckDB
    list_sort(list)), assignment ties break to the lowest code on
    both sides (array_position-first-min vs ORDER BY d2, code), the
    engine's driver-side Python LUT entries are sum((a-b)^2) left
    folds re-entering the plan via repr round-trip (exact), and the
    ADC accumulation is left-associated in subspace order on both
    sides. Identical codebooks -> identical codes -> identical ADC
    bits -> identical shortlist -> bit-identical rerank."""
    d_sub = dim // n_subspaces

    def d2(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(list_zip({a}, {b}),"
            " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
        )

    ctes = [
        "dvv AS (\n"
        "    SELECT vec_id, label,\n"
        "           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d\n"
        "    FROM embeddings\n"
        ")",
        # unit-normalize exactly as the engine: norm = left-fold sum of
        # squares from 0.0 (== plain fold from x0^2), then x / norm
        "nv AS (\n"
        "    SELECT vec_id, label,\n"
        "           list_transform(d, x -> x / sqrt(\n"
        "               list_reduce(list_transform(d, y -> y * y),"
        " (a, b) -> a + b))) AS v\n"
        "    FROM dvv\n"
        ")",
        "seed AS (\n"
        "    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM nv\n"
        f"    QUALIFY rn <= {n_codes}\n"
        ")",
    ]
    for s in range(n_subspaces):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        ctes.append(
            f"sub{s} AS (SELECT vec_id, v[{lo}:{hi}] AS sub FROM nv)"
        )
        ctes.append(
            f"cb{s}_0 AS (SELECT rn - 1 AS code, v[{lo}:{hi}] AS cent FROM seed)"
        )
        # iterations assign+means rounds, then one final assign under
        # the trained codebook (the engine encodes AFTER the loop)
        for i in range(1, iterations + 1):
            ctes.append(
                f"a{s}_{i} AS (\n"
                f"    SELECT d.vec_id, d.sub, c.code,\n"
                f"           row_number() OVER (PARTITION BY d.vec_id\n"
                f"               ORDER BY {d2('d.sub', 'c.cent')}, c.code) AS _r\n"
                f"    FROM sub{s} d CROSS JOIN cb{s}_{i - 1} c\n"
                f"    QUALIFY _r = 1\n"
                f")"
            )
            ctes.append(
                f"cb{s}_{i} AS (\n"
                f"    SELECT p.code, coalesce(m.cent, p.cent) AS cent\n"
                f"    FROM cb{s}_{i - 1} p LEFT JOIN (\n"
                f"        SELECT code, list(m ORDER BY pos) AS cent FROM (\n"
                f"            SELECT code, pos,\n"
                f"                   list_reduce(list_sort(list(x)),"
                f" (a, b) -> a + b) / count(x) AS m\n"
                f"            FROM (SELECT code, unnest(sub) AS x,\n"
                f"                         unnest(range(len(sub))) AS pos\n"
                f"                  FROM a{s}_{i})\n"
                f"            GROUP BY code, pos\n"
                f"        ) GROUP BY code\n"
                f"    ) m USING (code)\n"
                f")"
            )
        ctes.append(
            f"f{s} AS (\n"
            f"    SELECT d.vec_id, c.code,\n"
            f"           row_number() OVER (PARTITION BY d.vec_id\n"
            f"               ORDER BY {d2('d.sub', 'c.cent')}, c.code) AS _r\n"
            f"    FROM sub{s} d CROSS JOIN cb{s}_{iterations} c\n"
            f"    QUALIFY _r = 1\n"
            f")"
        )
    ctes.append(
        "q AS (\n"
        "    SELECT vec_id AS query_id, v,\n"
        "           row_number() OVER (ORDER BY vec_id) AS _qr\n"
        f"    FROM nv QUALIFY _qr <= {n_queries}\n"
        ")"
    )
    term_selects = []
    for s in range(n_subspaces):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        term_selects.append(
            f"    SELECT q.query_id, a.vec_id, {s} AS s,\n"
            f"           {d2(f'q.v[{lo}:{hi}]', 'c.cent')} AS term\n"
            f"    FROM q CROSS JOIN f{s} a\n"
            f"    JOIN cb{s}_{iterations} c ON c.code = a.code\n"
            f"    WHERE a.vec_id <> q.query_id"
        )
    ctes.append("terms AS (\n" + "\n    UNION ALL\n".join(term_selects) + "\n)")
    shortlist = (
        f"greatest({8 * k}, (SELECT count(*) // 8 FROM nv))"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
adc AS (
    SELECT query_id, vec_id,
           list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS _adc
    FROM terms GROUP BY query_id, vec_id
),
short AS (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY _adc, vec_id) AS _r
    FROM adc
    QUALIFY _r <= {shortlist}
),
rr AS (
    SELECT s.query_id, s.vec_id, cv.label,
           round({_DOT.format(a='q.v', b='cv.v')}, 6) AS cos_sim
    FROM short s
    JOIN q ON q.query_id = s.query_id
    JOIN nv cv ON cv.vec_id = s.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cos_sim DESC, vec_id) AS rank
    FROM rr
)
SELECT query_id, vec_id, label, rank, cos_sim
FROM ranked WHERE rank <= {k}
"""
    )


def ivf_topk_tuned_sql(
    n_lists: int = 16,
    iterations: int = 3,
    n_probe: int = 2,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    """Multi-probe IVF ANN oracle (mirrors llmdata.similarity.ivf_topk
    at n_probe>1): the same unrolled Lloyd loop as `ivf_topk_sql`,
    plus the one thing multi-probe adds -- rank every FINAL-assignment
    centroid by squared distance to the query and probe the n_probe
    nearest cells.

    The engine's probe centroids (similarity.py `cents`) are the
    per-dimension means of the final assignment, computed ONLY for
    clusters that actually appear in it -- an empty cluster cannot be
    probed. Mirrored here with a plain GROUP BY over the final
    assignment (no coalesce-with-previous, unlike the Lloyd means
    CTEs, where the engine's kmeans_assign keeps an empty cluster's
    old centroid).

    Cross-engine stability adds ONE new margin surface on top of the
    assignment margins: the query's n_probe-th vs (n_probe+1)-th
    nearest-centroid squared-distance gap must dwarf avg()
    reassociation noise (~6e-12 propagated bound) -- pinned per
    embeddings fixture by
    tests/test_ann.py::test_ivf_probe_rank_margins. Ties break to the
    lowest cluster index on both sides (ORDER BY _d2, cluster). Each
    candidate lives in exactly one cluster and the probed cells are
    distinct, so no cross-probe duplicate handling is needed; once
    candidate sets agree the raw-vector cosine rerank is
    bit-identical."""
    ctes, final = _lloyd_ctes(n_lists, iterations)
    d2q = (
        "list_reduce(list_transform(list_zip(q.v, c.cent),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )
    cos = _cos_expr("p.v", "cand.v")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
fcent AS (
    SELECT cluster, list(m ORDER BY pos) AS cent FROM (
        SELECT cluster, pos, avg(x) AS m FROM (
            SELECT cluster, unnest(v) AS x,
                   unnest(range(len(v))) AS pos
            FROM {final}
        ) GROUP BY cluster, pos
    ) GROUP BY cluster
),
q AS (
    SELECT vec_id AS query_id, v FROM {final}
    WHERE vec_id < {n_queries}
),
probe AS (
    SELECT q.query_id, q.v, c.cluster AS probe_cluster,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {d2q}, c.cluster) AS _pr
    FROM q CROSS JOIN fcent c
    QUALIFY _pr <= {n_probe}
),
scored AS (
    SELECT p.query_id, cand.vec_id, dv.label, {cos} AS _cos
    FROM probe p
    JOIN {final} cand ON cand.cluster = p.probe_cluster
                     AND cand.vec_id <> p.query_id
    JOIN dv ON dv.vec_id = cand.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY _cos DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, label, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""
    )


def importance_weights_sql(target_source: str = "src1") -> str:
    """Oracle for curation.importance_weights (DSIR hashed-n-gram
    importance weights): same md5-prefix bucket key, the same
    one-double-division smoothed ratio, ln quantized at 6 BEFORE the
    DECIMAL per-doc sum (boundary margins pinned per fixture by
    test_properties.test_importance_rate_rounding_margins). Bigrams
    mirror the engine's zip_with null propagation: DuckDB list_zip
    pads the shorter slice with NULL and || propagates it, so the
    tail entries filter out identically."""
    return f"""
WITH toks AS (
    SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS t
    FROM documents
),
feats AS (
    SELECT doc_id, source, u.f
    FROM toks, UNNEST(
        list_concat(
            t,
            list_filter(
                list_transform(list_zip(t, t[2:]), x -> x[1] || ' ' || x[2]),
                y -> y IS NOT NULL)
        )
    ) AS u(f)
),
hashed AS (
    SELECT doc_id, source, substr(md5(f), 1, 2) AS fkey FROM feats
),
stats AS (
    SELECT fkey, COUNT(*) AS cs,
           COUNT(*) FILTER (WHERE source = '{target_source}') AS ct
    FROM hashed GROUP BY fkey
),
tot AS (
    SELECT COUNT(*) AS s_total,
           COUNT(*) FILTER (WHERE source = '{target_source}') AS t_total
    FROM hashed
),
rates AS (
    SELECT fkey,
        CAST(round(ln(((ct + 1.0) * (s_total + 256.0)) /
                      ((cs + 1.0) * (t_total + 256.0))), 6)
             AS DECIMAL(18,6)) AS r
    FROM stats CROSS JOIN tot
),
db AS (
    SELECT doc_id, fkey, COUNT(*) AS c FROM hashed GROUP BY doc_id, fkey
)
SELECT db.doc_id,
    CAST(SUM(db.c) AS BIGINT) AS n_features,
    CAST(SUM(CAST(db.c AS DECIMAL(18,0)) * rates.r) AS DOUBLE)
        AS importance_weight
FROM db JOIN rates USING (fkey)
GROUP BY db.doc_id
"""


def _bpe_cte_prefix(n_merges: int) -> str:
    """The shared BPE training CTE chain (vocab -> enc0 -> k rounds of
    pairs/best/enc), each enc carrying the original word ``w`` so the
    encode oracle can join documents back to their final
    segmentation."""
    sep = "chr(31)"
    parts = [
        f"""
WITH vocab AS (
    SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents
    ) WHERE len(w) > 0 AND NOT contains(w, {sep})
    GROUP BY w
),
enc0 AS (
    SELECT w, regexp_replace(w, '(.)', {sep} || '\\1' || {sep}, 'g') AS enc, freq
    FROM vocab
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f""",
pairs{r} AS (
    SELECT p[1] AS l, p[2] AS rr, SUM(freq) AS n
    FROM (
        SELECT freq, list_filter(
            list_transform(list_zip(syms, syms[2:]),
                x -> CASE WHEN x[2] IS NULL THEN NULL ELSE [x[1], x[2]] END),
            y -> y IS NOT NULL) AS ps
        FROM (
            SELECT freq, list_transform(string_split(enc, {sep} || {sep}),
                                        s -> replace(s, {sep}, '')) AS syms
            FROM enc{r - 1}
        )
    ), UNNEST(ps) AS u(p)
    GROUP BY 1, 2
),
best{r} AS (
    SELECT l, rr, n FROM pairs{r} ORDER BY n DESC, l ASC, rr ASC LIMIT 1
),
enc{r} AS (
    SELECT e.w,
           CASE WHEN b.l IS NULL THEN e.enc
           ELSE replace(e.enc,
                        {sep} || b.l || {sep} || {sep} || b.rr || {sep},
                        {sep} || b.l || b.rr || {sep}) END AS enc,
           e.freq
    FROM enc{r - 1} e LEFT JOIN best{r} b ON TRUE
)"""
        )
    return "".join(parts)


def bpe_train_sql(n_merges: int = 8) -> str:
    """Oracle for text.bpe_train: the k merge rounds unroll into k CTE
    triples (pairs -> best -> re-encoded vocab). Every step is exact
    integer/string work -- counts are integers, the argmax order
    (n DESC, left ASC, right ASC) is total, and merge application is
    the same literal wrapped-separator replace -- so the engine's
    per-round collected decision and this in-SQL decision coincide
    with no margin argument. LEFT JOIN ON TRUE keeps an exhausted
    pair space a no-op round instead of emptying the vocab."""
    union = "\nUNION ALL\n".join(
        f'SELECT {r} AS rank, l AS "left", rr AS "right", '
        f"CAST(n AS BIGINT) AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_cte_prefix(n_merges) + "\n" + union


def bpe_encode_sql(n_merges: int = 8) -> str:
    """Oracle for text.bpe_encode_stats: the same training prefix,
    then documents join their exploded words against the FINAL
    vocabulary segmentation (segment count = wrapped-separator split
    length). SUM over BIGINT is HUGEINT in DuckDB -> cast back (the
    r3 Arrow-type gotcha)."""
    sep = "chr(31)"
    k = n_merges
    return f"""{_bpe_cte_prefix(n_merges)},
doc_words AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
        FROM documents
    ) WHERE len(w) > 0 AND NOT contains(w, {sep})
),
seg AS (
    SELECT w, len(string_split(enc, {sep} || {sep})) AS n_sub FROM enc{k}
)
SELECT d.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(s.n_sub) AS BIGINT) AS n_subwords,
    round(CAST(SUM(s.n_sub) AS DOUBLE) / COUNT(*), 6) AS avg_subwords_per_word
FROM doc_words d JOIN seg s USING (w)
GROUP BY d.doc_id
"""


def repeated_passages_exact_sql(window: int = RK_WINDOW) -> str:
    """Oracle for text.repeated_passages_exact — the slice bounds are
    generated from the SAME window constant as the engine op (the
    parameterized-oracle discipline of bpe_train_sql/rerank_topk_sql),
    so a RK_WINDOW change or non-default call cannot silently diverge
    the pair."""
    w = int(window)
    return rf"""
WITH tw AS (
    SELECT doc_id,
        regexp_split_to_array(text, '\s+') AS t,
        list_transform(regexp_split_to_array(text, '\s+'),
                       x -> CAST(length(x) * 131 + ascii(x) AS BIGINT)) AS c
    FROM documents
),
narrow AS (
    SELECT doc_id, u.i AS pos,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(c, u.i, u.i + {w - 1})),
                    (a, x) -> (a * 1000003 + x) % 2147483647) AS passage_hash,
        array_to_string(list_slice(t, u.i, u.i + {w - 1}), ' ') AS passage
    FROM tw, UNNEST(generate_series(1, len(c) - {w} + 1)) AS u(i)
),
cand AS (
    SELECT passage_hash FROM narrow
    GROUP BY passage_hash HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT passage,
    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
    CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM narrow JOIN cand USING (passage_hash)
GROUP BY passage HAVING COUNT(DISTINCT doc_id) >= 2
"""


REPEATED_PASSAGES_EXACT_SQL = repeated_passages_exact_sql()


def curation_funnel_sql(planes: tuple, bands: int, rows_per_band: int) -> str:
    """Funnel oracle: GROUP BY over the generated full-ladder SQL
    (same plane literals), stage = COALESCE(drop_reason, 'kept').
    SUM(INT) is HUGEINT in DuckDB -- cast to BIGINT to match Spark's
    long (the r3 type-drift gotcha)."""
    return f"""
WITH full_verdict AS (
{curation_full_sql(planes, bands, rows_per_band)}
)
SELECT COALESCE(drop_reason, 'kept') AS stage,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM full_verdict
GROUP BY 1
"""
