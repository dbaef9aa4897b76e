"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure per-row Column expressions (JVM-side,
inside whole-stage codegen — no UDFs, no shuffle), each with a DuckDB
SQL mirror generator for the correctness oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hogflare_spark.functions import text as T
from hogflare_spark.functions.hashing import M31, h60, h60_sql

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deterministic and mirrored into the oracle SQL; tie-break = first entry.
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]),
    ("de", ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"]),
    ("es", ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"]),
    ("fr", ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"]),
    ("zh", ["de5", "shi4", "zai4", "le5", "wo3", "you3", "he2", "ren2", "zhe4", "ta1"]),
]

FINGERPRINT_INIT = 7
FINGERPRINT_MULT = 31


def ws_token_count(col: Column) -> Column:
    return F.size(T.tokens(col))


def ws_token_count_sql(expr: str) -> str:
    return f"len({T.tokens_sql(expr)})"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (words + punctuation marks)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(T.BPE_TOKEN_RE), 0))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '{T.BPE_TOKEN_RE}'))"


def _stop_ratio(tok: Column, words: list[str]) -> Column:
    hits = F.size(F.array_intersect(F.array_distinct(tok), F.array(*[F.lit(w) for w in words])))
    return F.when(F.size(tok) > 0, hits.cast("double") / F.size(F.array_distinct(tok))).otherwise(
        F.lit(0.0)
    )


def _stop_ratio_sql(tok_expr: str, words: list[str]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CASE WHEN len({tok_expr}) > 0 THEN "
        f"len(list_intersect(list_distinct({tok_expr}), {lit}))::DOUBLE "
        f"/ len(list_distinct({tok_expr})) ELSE 0.0 END"
    )


def lang_id(col: Column) -> Column:
    """Predicted language: argmax stopword-hit ratio over LANG_PROFILES;
    ties (incl. all-zero) resolve to the earliest profile. Returns the
    profile key ('en', 'de', ...)."""
    tok = T.tokens(col)
    best_lang = F.lit(LANG_PROFILES[0][0])
    best_score = _stop_ratio(tok, LANG_PROFILES[0][1])
    for lang, words in LANG_PROFILES[1:]:
        score = _stop_ratio(tok, words)
        strictly_better = score > best_score
        best_lang = F.when(strictly_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(strictly_better, score).otherwise(best_score)
    return best_lang


def lang_id_sql(expr: str) -> str:
    tok = T.tokens_sql(expr)
    sql_lang = f"'{LANG_PROFILES[0][0]}'"
    sql_score = _stop_ratio_sql(tok, LANG_PROFILES[0][1])
    for lang, words in LANG_PROFILES[1:]:
        score = _stop_ratio_sql(tok, words)
        sql_lang = f"CASE WHEN ({score}) > ({sql_score}) THEN '{lang}' ELSE ({sql_lang}) END"
        sql_score = f"CASE WHEN ({score}) > ({sql_score}) THEN ({score}) ELSE ({sql_score}) END"
    return sql_lang


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0, 1]:
    0.3*length_norm + 0.3*lexical_diversity + 0.2*stopword_ratio
    + 0.2*word_length_norm — the usual cheap pre-filter features
    (length, diversity, stopword density, mean token length).

    NOTE the expression references its tokenize split from several
    sub-expressions, and the HOF copies never codegen, so the split
    re-evaluates per feature. Callers scoring a whole corpus should
    use `quality_token_features` (below), which materializes the
    tokens once and computes the identical arithmetic from the stored
    array — this Column form exists for composability and the SQL
    twins."""
    return _quality_score_from(T.tokens(col), F.length(col))


def _quality_score_from(tok: Column, chars: Column) -> Column:
    """The quality arithmetic over a caller-supplied tokens column and
    char count — the single definition both entry points share, so the
    materialized-token path cannot drift from the Column form."""
    n = F.size(tok)
    length_norm = F.least(F.lit(1.0), chars.cast("double") / 500.0)
    diversity = F.when(n > 0, F.size(F.array_distinct(tok)).cast("double") / n).otherwise(F.lit(0.0))
    stop = _stop_ratio(tok, LANG_PROFILES[0][1])
    mean_len = F.when(
        n > 0,
        F.aggregate(tok, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double") / n,
    ).otherwise(F.lit(0.0))
    word_norm = F.least(F.lit(1.0), mean_len / 8.0)
    score = 0.3 * length_norm + 0.3 * diversity + 0.2 * stop + 0.2 * word_norm
    # portable 6-decimal rounding: engine round() implementations disagree
    # on exact .5e-6 midpoints (observed at sf0.1: the same double rounded
    # to 0.432462 by Spark and 0.432463 by DuckDB), while floor(x*1e6+0.5)
    # is pure IEEE arithmetic — identical everywhere for identical x.
    # Valid for x >= 0, which quality is by construction.
    return F.floor(score * 1e6 + 0.5) / F.lit(1e6)


def quality_score_sql(expr: str) -> str:
    tok = T.tokens_sql(expr)
    length_norm = f"least(1.0, length({expr})::DOUBLE / 500.0)"
    diversity = (
        f"CASE WHEN len({tok}) > 0 THEN len(list_distinct({tok}))::DOUBLE / len({tok}) "
        f"ELSE 0.0 END"
    )
    stop = _stop_ratio_sql(tok, LANG_PROFILES[0][1])
    mean_len = (
        f"CASE WHEN len({tok}) > 0 THEN "
        f"list_sum(list_transform({tok}, t -> length(t)))::DOUBLE / len({tok}) ELSE 0.0 END"
    )
    word_norm = f"least(1.0, ({mean_len}) / 8.0)"
    score = (
        f"0.3 * ({length_norm}) + 0.3 * ({diversity}) "
        f"+ 0.2 * ({stop}) + 0.2 * ({word_norm})"
    )
    # portable midpoint-safe rounding — see quality_score
    return f"floor(({score}) * 1000000 + 0.5) / 1000000"


def quality_token_features(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """(id, ws_tokens, bpe_tokens, quality) for a whole corpus with the
    tokenize split evaluated exactly ONCE per row.

    The single-projection Column form pays the split repeatedly: the
    quality expression references its tokens from several
    sub-expressions, whole-stage-codegen subexpression elimination
    cannot reach the copies inside the CodegenFallback higher-order
    functions (aggregate/array ops over the split), and the regex split
    is the dominant per-row cost. Materializing a narrow
    (id, tok, bpe_tokens, chars) projection through a tracked cache —
    the bm25 per_doc pattern (guide §5) — makes every downstream
    reference an attribute read of the stored array. Measured warm on
    the 10x dataset (same-session alternation, outputs asserted
    identical): 28.7 s → 3.9 s. fan_out parallelizes the one tokenize
    pass on single-file corpora (guide §2.5); the cache is released at
    the host's quiescent point like every cache backing a returned
    frame. The arithmetic is `_quality_score_from` — the same code the
    Column form runs, so the two paths cannot drift."""
    from hogflare_spark.functions.caching import cached
    from hogflare_spark.operators.partitioning import fan_out

    base = cached(
        fan_out(df.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col),
            T.tokens(F.col(text_col)).alias("tok"),
            bpe_token_count(F.col(text_col)).alias("bpe_tokens"),
            F.length(F.col(text_col)).alias("chars"),
        )
    )
    return base.select(
        F.col(id_col),
        F.size("tok").alias("ws_tokens"),
        "bpe_tokens",
        _quality_score_from(F.col("tok"), F.col("chars")).alias("quality"),
    )


def fingerprint(col: Column) -> Column:
    """Order-sensitive rolling-hash document fingerprint: fold
    h := (h*31 + h60(token) % M31) % M31 over the token stream, init 7.
    Detects exact token-sequence duplicates independent of whitespace."""
    tok = T.tokens(col)
    return F.aggregate(
        tok,
        F.lit(FINGERPRINT_INIT).cast("long"),
        lambda acc, t: (acc * FINGERPRINT_MULT + h60(t) % M31) % M31,
    )


def fingerprint_sql(expr: str) -> str:
    tok = T.tokens_sql(expr)
    return (
        f"list_reduce(list_prepend(CAST({FINGERPRINT_INIT} AS BIGINT), "
        f"list_transform({tok}, t -> {h60_sql('t')} % {M31})), "
        f"(a, b) -> (a * {FINGERPRINT_MULT} + b) % {M31})"
    )


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style corpus quality rules, Rae et al. 2021:
# high duplicate-token / dominant-n-gram fractions mark low-quality or
# degenerate documents) and PII scrubbing — both staples of training-data
# filtering at scale.
# ---------------------------------------------------------------------------


def _clean_tokens(col: Column) -> Column:
    """Tokens with empty strings removed (split('') yields [''])."""
    return F.filter(T.tokens(col), lambda t: t != "")


def _raw_bigrams(tok: Column) -> Column:
    """NON-distinct space-joined bigrams (frequency analysis needs
    multiplicity, unlike functions.text.shingles which dedups for
    sketching)."""
    idx = F.sequence(F.lit(1), F.size(tok) - 1)
    return F.when(
        F.size(tok) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, 2))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(col: Column) -> Column:
    """struct(n_tokens, distinct_token_frac, top_bigram_frac) — pure
    per-row expressions, shuffle-free.

    top_bigram_frac (share of the most frequent bigram) is computed
    scan-locally: sort the bigram array and fold it with `aggregate`,
    tracking the longest run of equal adjacent elements — no
    explode/groupBy shuffle of a corpus-sized posting table. The oracle
    intentionally USES the relational explode/groupBy/max formulation:
    two strategies, one result.
    """
    tok = _clean_tokens(col)
    n = F.size(tok)
    distinct_frac = F.when(n > 0, F.size(F.array_distinct(tok)).cast("double") / n).otherwise(
        F.lit(0.0)
    )
    sorted_bg = F.sort_array(_raw_bigrams(tok))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    max_bg = F.aggregate(sorted_bg, zero, _step, lambda acc: acc["best"])
    top_bg_frac = F.when(
        n > 1, max_bg.cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))
    return F.struct(
        n.cast("long").alias("n_tokens"),
        distinct_frac.alias("distinct_token_frac"),
        top_bg_frac.alias("top_bigram_frac"),
    )


# PII patterns kept inside the RE2 ∩ java.util.regex dialect (no
# backreferences, no lookaround) so the Spark expression and the DuckDB
# oracle compile the same automaton.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_counts(col: Column) -> list[Column]:
    """Per-pattern match counts over the ORIGINAL text (counting after a
    prior pattern's replacement would undercount overlapping classes)."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_pii(col: Column) -> Column:
    """Redact every PII class, applying patterns in PII_PATTERNS order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts_sql(expr: str) -> list[str]:
    return [
        f"len(regexp_extract_all({expr}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def unigram_lm_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-trained unigram LM quality score per document — the
    CCNet-style "score each doc against a language model of the corpus"
    step, reduced to its distributable core: pass 1 trains the model
    (token → corpus frequency), pass 2 scores every document by its
    mean token probability. Rare-token-heavy documents (typos, codes,
    boilerplate IDs) score low; documents made of common tokens score
    high — the same ranking signal CCNet's perplexity buckets use.

    The score is the ARITHMETIC mean of token probabilities, not the
    geometric mean (log-perplexity): probabilities are single IEEE
    divisions of exact BIGINT counts and the per-doc reduction folds in
    sorted-token order, so the result is bit-identical across engines —
    ln/exp are NOT correctly-rounded in IEEE and would make a
    cross-engine hash gate flake (the same reason quality_score uses
    floor-based rounding). Monotonicity per token is preserved, which
    is what the downstream filter consumes.

    Scale shape: pass 1 is a partial-aggregated groupBy on the token
    key (|vocab| rows out); pass 2 re-keys per-(doc, token) counts —
    both shuffles are token-bounded, and the model join is a plain
    equi-join the planner can broadcast when |vocab| allows.

    Output: (doc_id, n_tokens, n_distinct_tokens, mean_tok_prob).
    """
    tk = df.select(
        F.col(id_col).alias("id"), F.explode(T.tokens(F.col(text_col))).alias("token")
    )
    vocab = tk.groupBy("token").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    dt = tk.groupBy("id", "token").agg(F.count("*").alias("c"))
    term = dt.join(vocab, "token").crossJoin(F.broadcast(total)).select(
        "id",
        "token",
        "c",
        (
            F.col("c").cast("double")
            * (F.col("cnt").cast("double") / F.col("total").cast("double"))
        ).alias("term"),
    )
    doc = term.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("_s"),
    )
    mean = F.col("_s") / F.col("n_tokens").cast("double")
    return doc.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_distinct_tokens",
        (F.floor(mean * 1e6 + F.lit(0.5)) / F.lit(1e6)).alias("mean_tok_prob"),
    )


def unigram_lm_scores_sql(table: str, text_expr: str, id_expr: str) -> str:
    """DuckDB mirror: same counts, same division order, same sorted-token
    fold (list_sum over `list(term ORDER BY token)` matches Spark's
    sorted-struct aggregate fold)."""
    tok = T.tokens_sql(text_expr)
    return f"""
    WITH tk AS (
      SELECT {id_expr} AS id, unnest({tok}) AS token FROM {table}
    ), vocab AS (
      SELECT token, count(*) AS cnt FROM tk GROUP BY token
    ), tot AS (SELECT sum(cnt) AS total FROM vocab),
    dt AS (SELECT id, token, count(*) AS c FROM tk GROUP BY id, token),
    term AS (
      SELECT id, token, c,
             c::DOUBLE * (cnt::DOUBLE / total::DOUBLE) AS term
      FROM dt JOIN vocab USING (token), tot
    ), doc AS (
      SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct_tokens,
             list_sum(list(term ORDER BY token)) AS s
      FROM term GROUP BY id
    )
    SELECT id AS doc_id, n_tokens, n_distinct_tokens,
           floor(s / n_tokens::DOUBLE * 1000000 + 0.5) / 1000000
             AS mean_tok_prob
    FROM doc
    """


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language quality buckets (Wenzek et al. 2020):
    score every document against the corpus LM (unigram_lm_scores),
    then split each language into `n_buckets` equal-frequency buckets —
    head / middle / tail for the default 3 — so downstream sampling can
    up-weight the head and drop the tail, the canonical web-corpus
    curation recipe.

    Shape: one window (ntile) partitioned by language over the scored
    docs. The order key is (rounded score DESC, doc_id) — total and
    deterministic, so Spark's ntile and DuckDB's agree row-for-row. At
    100 TB the exact equal-frequency split is a per-language sort; the
    scale relaxation is to pre-compute approx score cutpoints
    (approx_percentile) and assign buckets by comparison — a map-only
    scan — at the cost of exactness at the boundaries. The exact form
    is kept here because the oracle gate requires bit-stable output.

    Output: (doc_id, lang, mean_tok_prob, bucket, bucket_name).
    """
    from pyspark.sql.window import Window

    scores = unigram_lm_scores(df, text_col, id_col)
    langs = df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    j = scores.join(langs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_tok_prob").desc(), F.col("doc_id").asc()
    )
    b = F.ntile(n_buckets).over(w)
    return j.select(
        "doc_id",
        "lang",
        "mean_tok_prob",
        b.alias("bucket"),
        F.when(b == 1, F.lit("head"))
        .when(b == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("bucket_name"),
    )


def perplexity_buckets_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    lang_expr: str,
    n_buckets: int = 3,
) -> str:
    """DuckDB mirror: same score CTE, same ntile over the same total
    order key."""
    inner = unigram_lm_scores_sql(table, text_expr, id_expr)
    return f"""
    WITH s AS ({inner}),
    j AS (
      SELECT s.doc_id, d.{lang_expr} AS lang, s.mean_tok_prob,
             ntile({n_buckets}) OVER (
               PARTITION BY d.{lang_expr}
               ORDER BY s.mean_tok_prob DESC, s.doc_id ASC
             ) AS bucket
      FROM s JOIN {table} d ON d.{id_expr} = s.doc_id
    )
    SELECT doc_id, lang, mean_tok_prob, bucket,
           CASE WHEN bucket = 1 THEN 'head'
                WHEN bucket = {n_buckets} THEN 'tail'
                ELSE 'middle' END AS bucket_name
    FROM j
    """


def perplexity_buckets_sampled(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    n_buckets: int = 3,
    sample_mod: int = 1,
) -> DataFrame:
    """The at-scale form of perplexity_buckets: fit the per-language
    bucket CUTPOINTS on a deterministic id-stride sample, then assign
    every document by comparison — the corpus-wide work is a map-only
    scan plus one broadcast join of (n_buckets-1) boundary rows per
    language, with NO per-language global sort. This is how CCNet
    actually fits its head/middle/tail cutoffs (on a sample), and the
    sort cost moves from |corpus| to |sample|.

    Determinism: the boundary for bucket b is the sample row at rank
    ceil(b·n/n_buckets) under the total order (score DESC, doc_id ASC);
    a document lands in bucket b when its (score, doc_id) key is ≤ that
    boundary key under the same order. Scores are already 1e-6-rounded
    (unigram_lm_scores), so the comparison is engine-stable. With
    sample_mod=1 (full sample) the assignment provably EQUALS the exact
    ntile of perplexity_buckets: ntile hands the first n%k buckets
    ceil(n/k) rows, exactly the rank-ceiling boundaries used here
    (pinned by test).

    Output: (doc_id, lang, mean_tok_prob, bucket).
    """
    scores = unigram_lm_scores(df, text_col, id_col)
    langs = df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    scored = scores.join(langs, "doc_id").select("doc_id", "lang", "mean_tok_prob")

    from pyspark.sql.window import Window

    sample = scored.where(F.col("doc_id") % sample_mod == 0)
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_tok_prob").desc(), F.col("doc_id").asc()
    )
    ranked = sample.select(
        "lang",
        "mean_tok_prob",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    # boundary b (1-based, b < n_buckets) = the sample row at rank
    # ceil(b*n/n_buckets); emit its (score, id) key
    bounds = (
        ranked.select(
            "lang",
            "mean_tok_prob",
            "doc_id",
            "rn",
            *[
                (
                    F.col("rn")
                    == F.ceil(F.col("n") * F.lit(b) / F.lit(n_buckets)).cast("int")
                ).alias(f"is_b{b}")
                for b in range(1, n_buckets)
            ],
        )
        .where(
            reduce(lambda a, b: a | b, [F.col(f"is_b{b}") for b in range(1, n_buckets)])
        )
        .select(
            "lang",
            F.col("mean_tok_prob").alias("b_score"),
            F.col("doc_id").alias("b_id"),
            reduce(
                lambda a, b: F.least(a, b),
                [
                    F.when(F.col(f"is_b{b}"), F.lit(b)).otherwise(F.lit(n_buckets))
                    for b in range(1, n_buckets)
                ],
            ).alias("b"),
        )
    )
    # a doc's key (score DESC, id ASC) is <= the boundary key  <=>
    # score > b_score OR (score = b_score AND doc_id <= b_id)
    hit = scored.join(F.broadcast(bounds), "lang", "left").select(
        "doc_id",
        "lang",
        "mean_tok_prob",
        F.when(
            (F.col("mean_tok_prob") > F.col("b_score"))
            | (
                (F.col("mean_tok_prob") == F.col("b_score"))
                & (F.col("doc_id") <= F.col("b_id"))
            ),
            F.col("b"),
        ).alias("hit_b"),
    )
    return hit.groupBy("doc_id", "lang", "mean_tok_prob").agg(
        F.coalesce(F.min("hit_b"), F.lit(n_buckets)).cast("int").alias("bucket")
    )


def perplexity_buckets_sampled_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    lang_expr: str,
    n_buckets: int = 3,
    sample_mod: int = 1,
) -> str:
    """DuckDB mirror: same sample, same rank-ceiling boundaries, same
    key comparison."""
    inner = unigram_lm_scores_sql(table, text_expr, id_expr)
    bflags = ", ".join(
        f"rn = CAST(ceil(n * {b} / {n_buckets}.0) AS INT) AS is_b{b}"
        for b in range(1, n_buckets)
    )
    bterms = [
        f"CASE WHEN is_b{b} THEN {b} ELSE {n_buckets} END"
        for b in range(1, n_buckets)
    ]
    bleast = bterms[0] if len(bterms) == 1 else "least(" + ", ".join(bterms) + ")"
    bany = " OR ".join(f"is_b{b}" for b in range(1, n_buckets))
    return f"""
    WITH s AS ({inner}),
    scored AS (
      SELECT s.doc_id, d.{lang_expr} AS lang, s.mean_tok_prob
      FROM s JOIN {table} d ON d.{id_expr} = s.doc_id
    ),
    ranked AS (
      SELECT lang, mean_tok_prob, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY mean_tok_prob DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM scored WHERE doc_id % {sample_mod} = 0
    ),
    flagged AS (SELECT lang, mean_tok_prob, doc_id, {bflags} FROM ranked),
    bounds AS (
      SELECT lang, mean_tok_prob AS b_score, doc_id AS b_id, {bleast} AS b
      FROM flagged WHERE {bany}
    )
    SELECT sc.doc_id, sc.lang, sc.mean_tok_prob,
           CAST(coalesce(min(CASE
             WHEN sc.mean_tok_prob > bo.b_score
               OR (sc.mean_tok_prob = bo.b_score AND sc.doc_id <= bo.b_id)
             THEN bo.b END), {n_buckets}) AS INT) AS bucket
    FROM scored sc LEFT JOIN bounds bo ON bo.lang = sc.lang
    GROUP BY sc.doc_id, sc.lang, sc.mean_tok_prob
    """


def _ngrams12(tok: Column) -> Column:
    """Unigrams + space-joined bigrams, WITH multiplicity (unlike
    T.shingles, which deduplicates) — DSIR's hashed feature stream."""
    # Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty — guard
    # the single-token case explicitly (DuckDB's generate_series(1, 0)
    # is empty, so the mirror needs no guard).
    idx = F.when(F.size(tok) >= 2, F.sequence(F.lit(1), F.size(tok) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bi = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, 2)))
    return F.concat(tok, bi)


def _ngrams12_sql(tok_expr: str) -> str:
    return (
        f"list_concat({tok_expr}, "
        f"list_transform(generate_series(1, len({tok_expr}) - 1), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + 1), ' ')))"
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    target_value: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023):
    score every document by how much more likely its hashed n-gram
    features are under the TARGET distribution (rows where
    `target_col == target_value`, e.g. a trusted reference domain) than
    under the RAW corpus distribution. Downstream selection keeps the
    high-weight documents — the published recipe for steering a web
    crawl toward a target domain without training a model.

    Features are unigram+bigram tokens hashed into `n_buckets` buckets
    with the cross-engine 60-bit md5 hash (functions/hashing.h60), the
    paper's hashed-n-gram generative model. Both distributions get
    add-one (Laplace) smoothing over the bucket vocabulary, so buckets
    unseen in the target contribute a finite down-weight instead of a
    zero.

    The weight is the ARITHMETIC mean over the document's features of
    the per-bucket likelihood ratio p_target(b)/p_raw(b) — not the
    paper's log-product: ln/exp are not correctly-rounded IEEE ops and
    would flake a cross-engine hash gate, while the mean ratio is built
    from exact BIGINT counts with a fixed divide/multiply sequence and
    a sorted-bucket fold, bit-identical across engines (the same
    determinism argument as unigram_lm_scores). Monotonicity in each
    feature's ratio — the signal selection consumes — is preserved.
    Count-to-double conversions stay exact below 2^53 tokens per side.

    Scale shape: two token-bounded groupBys train both distributions
    (n_buckets rows out — broadcastable by construction), one
    (doc, bucket) groupBy re-keys the corpus, and the model join is a
    broadcast of n_buckets rows: no shuffle wider than the corpus
    token stream, same as unigram_lm_scores.

    Output: (doc_id, n_feats, imp_weight) — imp_weight >= 1 means
    "more target-like than the raw average".
    """
    feats = dsir_features(df, text_col, id_col, target_col, target_value, n_buckets)
    return dsir_score(feats, dsir_model_counts(feats), n_buckets)


def dsir_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    target_value: str,
    n_buckets: int = 256,
) -> DataFrame:
    """(id, is_target, b): the hashed unigram+bigram feature stream —
    the shared front of batch dsir_weights and the incremental model
    (streaming/incremental_model.IncrementalDsirModel)."""
    return df.select(
        F.col(id_col).alias("id"),
        (F.col(target_col) == F.lit(target_value)).alias("is_target"),
        F.explode(_ngrams12(T.tokens(F.col(text_col)))).alias("f"),
    ).select("id", "is_target", (h60(F.col("f")) % n_buckets).alias("b"))


def dsir_model_counts(feats: DataFrame) -> DataFrame:
    """(b, cr, ct): the DSIR generative model IS these exact integer
    bucket counts — and integer counts are order-free and additive, which
    is what makes the incremental per-snapshot model exactly equal the
    batch one (summing per-batch counts is the same number)."""
    raw = feats.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = feats.where("is_target").groupBy("b").agg(F.count("*").alias("ct"))
    return raw.join(tgt, "b", "left").select(
        "b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    )


def dsir_score(feats: DataFrame, model: DataFrame, n_buckets: int) -> DataFrame:
    """Score documents (from their feature stream) under a (b, cr, ct)
    model — arithmetic identical to the original inline dsir_weights
    body (same op sequence as the SQL mirror)."""
    totals = model.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    # ratio = ((ct+1)/(tt+B)) / ((cr+1)/(tr+B)), evaluated as two exact
    # int->double conversions per operand and one divide of products —
    # the same op sequence as the SQL mirror
    ratio = (
        (F.col("ct") + 1).cast("double") * (F.col("tr") + n_buckets).cast("double")
    ) / (
        (F.col("cr") + 1).cast("double") * (F.col("tt") + n_buckets).cast("double")
    )
    scored_model = model.crossJoin(F.broadcast(totals)).select(
        "b", ratio.alias("ratio")
    )

    db = feats.groupBy("id", "b").agg(F.count("*").alias("c"))
    term = db.join(F.broadcast(scored_model), "b").select(
        "id", "b", "c", (F.col("c").cast("double") * F.col("ratio")).alias("term")
    )
    doc = term.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_feats"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("_s"),
    )
    mean = F.col("_s") / F.col("n_feats").cast("double")
    return doc.select(
        F.col("id").alias("doc_id"),
        "n_feats",
        (F.floor(mean * 1e6 + F.lit(0.5)) / F.lit(1e6)).alias("imp_weight"),
    )


def dsir_model_counts_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    target_expr: str,
    target_value: str,
    n_buckets: int = 256,
) -> str:
    """DuckDB mirror of `dsir_model_counts`: the exact (b, cr, ct)
    integer bucket counts — the oracle for the incremental streaming
    model, whose accumulated counts must equal these bit-for-bit
    (additive ints; streaming/incremental_model.py)."""
    from hogflare_spark.functions.hashing import h60_sql

    tok = T.tokens_sql(text_expr)
    ng = _ngrams12_sql("tok")
    return f"""
    WITH base AS (
      SELECT {id_expr} AS id, {target_expr} = '{target_value}' AS is_target,
             {tok} AS tok FROM {table}
    ), feats AS (
      SELECT id, is_target, {h60_sql('f')} % {n_buckets} AS b
      FROM (SELECT id, is_target, unnest({ng}) AS f FROM base)
    ), raw AS (
      SELECT b, count(*) AS cr FROM feats GROUP BY b
    ), tgt AS (
      SELECT b, count(*) AS ct FROM feats WHERE is_target GROUP BY b
    )
    SELECT raw.b, raw.cr, coalesce(tgt.ct, 0) AS ct
    FROM raw LEFT JOIN tgt ON tgt.b = raw.b
    """


def dsir_weights_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    target_expr: str,
    target_value: str,
    n_buckets: int = 256,
) -> str:
    """DuckDB mirror: same hashed features, same Laplace ratio with the
    same divide/multiply sequence, same sorted-bucket fold."""
    from hogflare_spark.functions.hashing import h60_sql

    tok = T.tokens_sql(text_expr)
    ng = _ngrams12_sql("tok")
    return f"""
    WITH base AS (
      SELECT {id_expr} AS id, {target_expr} = '{target_value}' AS is_target,
             {tok} AS tok FROM {table}
    ), feats AS (
      SELECT id, is_target, {h60_sql('f')} % {n_buckets} AS b
      FROM (SELECT id, is_target, unnest({ng}) AS f FROM base)
    ), raw AS (
      SELECT b, count(*) AS cr FROM feats GROUP BY b
    ), tgt AS (
      SELECT b, count(*) AS ct FROM feats WHERE is_target GROUP BY b
    ), model AS (
      SELECT raw.b, raw.cr, coalesce(tgt.ct, 0) AS ct
      FROM raw LEFT JOIN tgt ON tgt.b = raw.b
    ), tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM model),
    scored AS (
      SELECT b,
             ((ct + 1)::DOUBLE * (tr + {n_buckets})::DOUBLE)
               / ((cr + 1)::DOUBLE * (tt + {n_buckets})::DOUBLE) AS ratio
      FROM model, tot
    ), db AS (
      SELECT id, b, count(*) AS c FROM feats GROUP BY id, b
    ), term AS (
      SELECT id, b, c, c::DOUBLE * ratio AS term
      FROM db JOIN scored USING (b)
    ), doc AS (
      SELECT id, CAST(sum(c) AS BIGINT) AS n_feats,
             list_sum(list(term ORDER BY b)) AS s
      FROM term GROUP BY id
    )
    SELECT id AS doc_id, n_feats,
           floor(s / n_feats::DOUBLE * 1000000 + 0.5) / 1000000 AS imp_weight
    FROM doc
    """


def topk_ngrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 50,
    approx_rsd: float | None = None,
) -> DataFrame:
    """Corpus-wide top-k word n-grams: (ngram, occurrences, doc_freq) —
    the frequency census behind boilerplate detection (high doc_freq,
    template headers/footers) and contamination triage (which repeated
    n-grams carry benchmark text).

    Spark shape: explode ALL n-gram occurrences (not the per-doc
    distinct set MinHash uses), then one aggregation computing count(*)
    and count(DISTINCT id) together. Catalyst 4.x rewrites the single
    distinct as dedup-then-count: partial-aggregate by (ngram, id),
    shuffle on that pair, THEN aggregate by ngram — a SECOND shuffle of
    the gram stream (no Expand for one distinct; Expand appears only
    with multiple distinct columns). Map-side combine still collapses
    the zipfian head inside each task. The final top-k is a TakeOrdered
    (k rows to the driver), never a global sort. At 100 TB the exact
    doc_freq's second shuffle is the threatened half — pass `approx_rsd`
    to swap count_distinct for approx_count_distinct; occurrences stays
    exact either way. The swap deletes the ENTIRE second exchange
    (HLL++ registers merge inside the same two-phase hash aggregate, so
    the plan collapses to one shuffle carrying one row per n-gram —
    plan-shape pytest in tests/test_round10.py pins exact=2/approx=1
    exchanges; executed by the llm_topk_ngrams_approx gate), but it is
    NOT free: each live n-gram key holds 2^p 4-bit-ish registers of
    partial-aggregation state (p=12 at rsd 0.02 ~ 4 KB/key), and the
    n-gram key space is huge and tail-heavy, where a tail key's few
    (ngram, id) dedup rows are CHEAPER than its sketch. Measured at
    sf0.1 local[32], warm: exact 4.6 s; approx rsd 0.02 5.1 s (a
    LOSS — sketch state dominates), rsd 0.05 3.7 s, rsd 0.1 3.4 s. So
    the swap wins when (a) precision is relaxed to rsd >= 0.05 and/or
    (b) the corpus is head-heavy (boilerplate n-grams with millions of
    distinct docs are exactly where the deduped (ngram, id) stream —
    what the second exchange carries — explodes while the sketch stays
    4 KB). The 100 TB guidance is therefore conditional, not a slogan:
    keep exact for tail-dominated vocab studies; sketch at rsd 0.05+
    for head-heavy boilerplate/contamination censuses over massive
    corpora.
    """
    from hogflare_spark.operators.partitioning import fan_out

    tok = T.tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    grams = F.when(
        F.size(tok) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    doc_freq = (
        F.approx_count_distinct("id", approx_rsd)
        if approx_rsd is not None
        else F.countDistinct("id")
    )
    # fan_out: a single-file corpus scans as ONE partition, serializing
    # the tokenize+explode+partial-agg map work on one core (profiled at
    # 3.3 s of a 3.6 s query at sf0.1 — guide §2.5 input skew); a no-op
    # on multi-file inputs.
    return (
        fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            doc_freq.alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), "ngram")
        .limit(k)
    )


def topk_ngrams_approx_check(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 50,
    approx_rsd: float = 0.02,
    tol: float = 0.10,
) -> DataFrame:
    """Oracle-compatible gate for the approx census: run the PRODUCTION
    plan (approx_count_distinct doc_freq — ONE shuffle, one row per
    n-gram), then verify its doc_freq against an exact recount computed
    ONLY for the k winning n-grams — a broadcast semi-join of the tiny
    top-k set back into the gram stream, so the exact-distinct's extra
    shuffle runs over k keys' rows, not the corpus.
    Emits (ngram, occurrences, df_within_tol); occurrences is exact in
    both paths, so the top-k SET and order hash-match an exact oracle,
    and the boolean is what the oracle asserts as a literal (the
    ev_sketch_rollup / ev_approx_distinct_users pattern). `tol` = 0.10
    is ~5 sigma at rsd 0.02 — deterministic-green at any SF (per-key
    exceedance P < 1e-6; see operators/rollup.sketch_rollup_check for
    the sigma arithmetic).
    """
    from hogflare_spark.functions.caching import cached

    # the census (k rows) feeds BOTH the gate output and the winners
    # semi-join; uncached it would recompute the one-shuffle census —
    # i.e. a third corpus scan — exactly the defect the bm25 batch
    # plan-shape test caught (host drains the cache at its quiescent
    # point).
    census = cached(
        topk_ngrams(df, text_col, id_col, n, k, approx_rsd=approx_rsd)
    )
    tok = T.tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    grams = F.when(
        F.size(tok) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    from hogflare_spark.operators.partitioning import fan_out

    exact = (
        fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(grams).alias("ngram"))
        .join(F.broadcast(census.select("ngram")), "ngram")
        .groupBy("ngram")
        .agg(F.countDistinct("id").alias("_exact_df"))
    )
    ex = F.col("_exact_df").cast("double")
    return (
        census.join(F.broadcast(exact), "ngram")
        .select(
            "ngram",
            "occurrences",
            (
                F.abs(F.col("doc_freq") - ex)
                <= F.greatest(ex * F.lit(tol), F.lit(2.0))
            ).alias("df_within_tol"),
        )
        .orderBy(F.desc("occurrences"), "ngram")
    )


def topk_ngrams_sql(
    table: str, text_expr: str, id_expr: str, n: int = 3, k: int = 50
) -> str:
    """DuckDB mirror: same occurrence explode, counts, and
    (occurrences DESC, ngram) deterministic top-k."""
    tok = T.tokens_sql(text_expr)
    return f"""
    WITH toks AS (
      SELECT {id_expr} AS id, {tok} AS tok FROM {table}
    ), grams AS (
      SELECT id, unnest(
        CASE WHEN len(tok) >= {n} THEN list_transform(
          generate_series(1, len(tok) - {n - 1}),
          i -> array_to_string(list_slice(tok, i, i + {n - 1}), ' '))
        ELSE [] END) AS ngram
      FROM toks
    )
    SELECT ngram, count(*) AS occurrences,
           count(DISTINCT id) AS doc_freq
    FROM grams GROUP BY ngram
    ORDER BY occurrences DESC, ngram LIMIT {k}
    """
