"""Text-analysis operators for a large-scale training-data pipeline.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` so the DuckDB driver can verify it
value-for-value.

Conventions shared with the oracles:
* tokens = non-empty splits of ``trim(text)`` on ``\\s+``;
* normalization = lowercase + collapse whitespace to single spaces;
* 60-bit string hash = first 15 hex digits of md5, parsed base-16 (portable
  between Spark ``conv`` and DuckDB ``::BIGINT`` on a 0x literal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,!?;:]"

# tiny per-language marker lexicons for the n-gram language-ID heuristic;
# scoring = count of marker-word hits, argmax wins (ties: language order)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "de", "una"],
}


def norm_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens as an array (COLD PATH ONLY: ``F.filter`` is an
    interpreted array HOF). Hot paths use ``n_tokens_col`` for counts and
    ``norm_tokens`` for arrays over pre-normalized text — both codegen."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def n_tokens_col(col: Column) -> Column:
    """Whitespace-token count without materializing an array: one
    ``regexp_count`` of non-space runs — pure whole-stage codegen."""
    return F.regexp_count(col, F.lit(r"\S+"))


def norm_tokens(col: Column) -> Column:
    """Token array of ``norm_text``-normalized text: the normal form has
    single-space separators and no edge whitespace, so a plain split is
    exact and no interpreted filter is needed (empty text → empty array)."""
    norm = norm_text(col)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash portable to DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (word pieces / numbers / single punctuation marks)."""
    txt = F.col("text")
    # BPE-ish pieces = runs of non-delimiter chars + each punctuation mark
    # on its own; counted with two regexp_counts (codegen) instead of the
    # former split + interpreted F.filter HOF
    bpe_count = F.regexp_count(
        txt, F.lit(r"[^\s.,!?;:]+")
    ) + F.regexp_count(txt, F.lit(r"[.,!?;:]"))
    return documents.select(
        "doc_id",
        n_tokens_col(txt).alias("n_tokens"),
        bpe_count.alias("n_bpe_tokens"),
        F.length(txt).alias("n_chars_measured"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic document quality: length, punctuation density, stopword
    ratio, mean token length — the standard pretraining-filter features.

    Hot path: everything is regexp/length arithmetic (whole-stage codegen).
    Spark's array higher-order functions are evaluated INTERPRETED per
    element — a previous HOF formulation cost ~100 µs/token (26.8 s for
    5k docs at sf0.1); this form is pure codegen.
    """
    txt = F.col("text")
    n_tok = n_tokens_col(txt)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, PUNCT_CLASS, ""))
    stop_re = r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(txt), F.lit(stop_re), 0))
    # mean token length = non-whitespace chars / token count
    n_nonspace = F.length(F.regexp_replace(F.trim(txt), r"\s+", ""))
    mean_tok_len = F.when(
        n_tok > 0, n_nonspace.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    score = (
        F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Marker-lexicon language ID (n-gram heuristic): per-language hit count
    over the token set, argmax with deterministic tie-break (hits desc,
    lang asc).

    Pure codegen: one ``regexp_extract_all`` per lexicon over the
    space-padded lowercased text — whitespace lookaround makes the regex
    count EXACTLY the whitespace-tokens equal to a marker (the round-1
    per-token array-HOF plan evaluated interpreted lambdas per element,
    ~100 µs/element — the banned hot-path shape)."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    langs = sorted(LANG_MARKERS)
    hits = {
        lang: F.size(
            F.regexp_extract_all(
                padded,
                F.lit(r"(?<=\s)(" + "|".join(LANG_MARKERS[lang]) + r")(?=\s)"),
                1,
            )
        )
        for lang in langs
    }
    best_hits = F.greatest(*[hits[lang] for lang in langs])
    pred = None
    for lang in langs:  # alphabetical — first max wins, matching the oracle
        cond = hits[lang] == best_hits
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(
            cond, F.lit(lang)
        )
    return documents.select(
        "doc_id",
        pred.alias("lang_pred"),
        best_hits.alias("marker_hits"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprint: 60-bit hash of normalized text (exact-dup key)
    plus the document's min word-shingle hash (a 1-permutation MinHash,
    stable under small reorderings — rolling-hash style)."""
    normed = norm_text(F.col("text"))
    content = documents.select(
        "doc_id", hash60(normed).alias("content_hash")
    )
    sh_min = (
        doc_shingles(documents, 3)
        .groupBy("doc_id")
        .agg(F.min(hash60(F.col("shingle"))).alias("min_shingle_hash"))
    )
    return content.join(sh_min, "doc_id")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text, as an array column.

    NOTE: array HOFs are interpreted per element in Spark — for bulk work
    prefer ``doc_shingles`` (posexplode + lead windows, fully codegen'd).
    """
    toks = norm_tokens(col)
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) rows — distinct word n-gram shingles per document.

    ZERO-shuffle plan: overlapping n-grams are extracted in one
    ``regexp_extract_all`` over the normalized text — the pattern is a
    zero-width position match (fixed-length lookbehind for the padded
    space, lookahead capturing the next ``n`` tokens), so consecutive
    matches overlap — then ``array_distinct`` + ``explode``, all inside
    the scan's map stage. The r1-r5 plan (posexplode tokens → per-doc
    ``lead`` window → dropDuplicates) shuffled and sorted EVERY TOKEN of
    the corpus before any aggregation; now the shingle frame has the
    scan's own partitioning and a consumer like ``minhash_signatures``
    ships only its k min-hashes per doc through its map-side-combined
    groupBy — at 100 TB the difference between shuffling the corpus and
    shuffling a few longs per document (guide §2.3). No interpreted
    array-lambda HOFs: ``array_distinct`` is a plain collection op.
    Documents with fewer than n tokens contribute their whole token
    string (matches ``shingles()``)."""
    txt = F.col("text")
    norm = norm_text(txt)
    pat = "(?<= )(?=(" + " ".join([r"\S+"] * n) + "))"
    arr = F.array_distinct(
        F.regexp_extract_all(F.concat(F.lit(" "), norm), F.lit(pat), 1)
    )
    shs = F.when(n_tokens_col(txt) < n, F.array(norm)).otherwise(arr)
    return documents.select("doc_id", F.explode(shs).alias("shingle"))


# PII patterns written to the COMMON subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b only — no
# lookarounds, no backreferences — so both engines match identical spans.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \-()]{6,}\d", "<PHONE>"),
]


def pii_scrub(documents: DataFrame) -> DataFrame:
    """PII redaction for training corpora: emails, IPv4 addresses and
    phone-like digit runs are replaced by typed placeholder tokens, in a
    fixed pattern order (email → ip → phone, so an IP never re-matches as
    a phone). Returns per-document match counts (over the ORIGINAL text)
    plus the portable 60-bit hash of the scrubbed text — the value the
    driver oracle verifies, so the full replacement output is checked
    without shipping the text twice.

    Pure whole-stage codegen: one ``regexp_count`` per pattern + a chain
    of ``regexp_replace`` — a single map stage fused into the scan; at
    100 TB this is scan-bandwidth-bound, exactly as a scrubber should be.
    """
    txt = F.col("text")
    counts = [
        F.regexp_count(txt, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = txt
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return documents.select(
        "doc_id", *counts, hash60(scrubbed).alias("scrub_hash")
    )


def corpus_filter(
    documents: DataFrame,
    lang: str = "en",
    min_quality: float = 0.35,
    max_dup_frac: float = 0.6,
    max_top_frac: float = 0.12,
) -> DataFrame:
    """The composed C4/Gopher-style corpus gate: language-ID + quality
    score + repetition filter + PII check folded into one keep/drop
    verdict with the FIRST failing rule as the reason (rule order: lang →
    quality → repetition → pii → ok).

    Composition semantics: the verdict is computed over the four
    operators' OUTPUT columns (i.e. the rounded, already-oracled values),
    so the driver oracle can literally compose the four certified SQL
    twins as subqueries — a bug in any constituent breaks this hash too.
    Four scans of the corpus (one per constituent) keeps each constituent
    independently testable; a production pipeline would fuse the three
    scan-level projections (quality/langid/pii are single-stage maps)
    into one pass and join only the shuffle-bearing repetition frame.
    """
    q = quality_score(documents).select("doc_id", "quality")
    lid = language_id(documents).select("doc_id", "lang_pred")
    rep = repetition_stats(documents).select(
        "doc_id", "dup_2gram_frac", "top_2gram_frac"
    )
    pii = pii_scrub(documents).select(
        "doc_id",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")).alias("n_pii"),
    )
    j = q.join(lid, "doc_id").join(rep, "doc_id").join(pii, "doc_id")
    reason = (
        F.when(F.col("lang_pred") != lang, F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(
            (F.col("dup_2gram_frac") > max_dup_frac)
            | (F.col("top_2gram_frac") > max_top_frac),
            F.lit("repetition"),
        )
        .when(F.col("n_pii") > 0, F.lit("pii"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "doc_id",
        "lang_pred",
        "quality",
        "n_pii",
        reason.alias("verdict"),
        (reason == "ok").alias("keep"),
    ).orderBy("doc_id")


def repetition_stats(documents: DataFrame, max_dup_frac: float = 0.6,
                     max_top_frac: float = 0.12) -> DataFrame:
    """Gopher/C4-style repetition signals: within-document n-gram
    duplication fractions plus a keep/drop verdict.

    Per document over normalized whitespace tokens:

    * ``n_2grams``        — total (non-distinct) word bigrams;
    * ``dup_2gram_frac``  — 1 − distinct/total bigrams (the "duplicate
      n-gram fraction" rule of Rae et al., *Gopher*, §A1.1);
    * ``top_2gram_frac``  — share of the single most frequent bigram;
    * ``top_token_frac``  — share of the single most frequent token;
    * ``keep``            — dup_2gram_frac ≤ ``max_dup_frac`` AND
      top_2gram_frac ≤ ``max_top_frac``.

    Plan shape (100 TB lens): posexplode tokens → per-doc ``lead`` window
    (the corpus's natural doc_id partitioning — one shuffle) → one
    groupBy(doc_id, gram) count + one groupBy(doc_id) rollup. Everything is
    codegen expressions; no interpreted array HOFs, no Python. Documents
    shorter than 2 tokens get zero-valued bigram stats (kept), via the
    left join back to the corpus frame.
    """
    base = documents.select("doc_id", norm_tokens(F.col("text")).alias("toks"))
    # ALL overlapping bigram occurrences (non-distinct — the dup-fraction
    # rule needs the multiset) via one zero-width overlapping
    # regexp_extract_all inside the scan stage; the r1-r5 posexplode +
    # per-doc lead-window plan shuffled and sorted every token first
    # (guide §2.4 — the exchange is gone, the groupBy below gets map-side
    # partial aggregation on (doc_id, gram))
    grams = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.concat(F.lit(" "), norm_text(F.col("text"))),
                F.lit(r"(?<= )(?=(\S+ \S+))"),
                1,
            )
        ).alias("gram"),
    )
    gram_counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    g_agg = gram_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_2grams"),
        F.count("*").alias("n_distinct_2grams"),
        F.max("c").alias("max_2gram_c"),
    )
    tok_counts = base.select(
        "doc_id", F.explode("toks").alias("t")
    ).groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    t_agg = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"), F.max("c").alias("max_tok_c")
    )
    out = (
        documents.select("doc_id")
        .join(g_agg, "doc_id", "left")
        .join(t_agg, "doc_id", "left")
    )
    n2 = F.coalesce(F.col("n_2grams"), F.lit(0))
    dup_frac = F.when(
        n2 > 0,
        1.0 - F.col("n_distinct_2grams").cast("double") / n2,
    ).otherwise(F.lit(0.0))
    top2 = F.when(
        n2 > 0, F.col("max_2gram_c").cast("double") / n2
    ).otherwise(F.lit(0.0))
    topt = F.when(
        F.coalesce(F.col("n_toks"), F.lit(0)) > 0,
        F.col("max_tok_c").cast("double") / F.col("n_toks"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        n2.alias("n_2grams"),
        F.round(dup_frac, 6).alias("dup_2gram_frac"),
        F.round(top2, 6).alias("top_2gram_frac"),
        F.round(topt, 6).alias("top_token_frac"),
        ((dup_frac <= max_dup_frac) & (top2 <= max_top_frac)).alias("keep"),
    )
