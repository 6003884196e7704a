"""Beyond-reference training-data operators (SURVEY.md section 7.6).

Large-scale LLM-data-pipeline ops over the ``documents`` and
``embeddings`` fixture tables, each designed as a distributed
DataFrame op (no driver-side collection, built-in functions only --
JVM-side, codegen'd):

- ``text``       - tokenization, quality scoring, language-ID,
                   fingerprinting
- ``dedup``      - exact dedup, MinHash+LSH near-dup
- ``similarity`` - embedding cosine top-k (brute force + LSH-bucketed)
- ``multimodal`` - binary-column decode plumbing (libs stubbed)

Every numeric output that feeds the DuckDB oracle avoids transcendental
functions (libm results are not bit-identical across engines) and
unordered double sums (reassociation): integer/decimal arithmetic or
ordered list folds only.
"""
