"""Text analysis operators for document corpora: token statistics,
quality scoring, language identification, fingerprinting.

All pure column expressions (JVM-side, codegen'd) — at 100 TB these are
map-only passes fused into the parquet scan, no shuffle except the
explicit aggregations. The regex/token conventions match functions.text
so the DuckDB oracles are literally the same computation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens

# Tiny per-language stopword anchor sets for the n-gram/stopword-count
# language heuristic. Deliberately minimal & deterministic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que"],
    "de": ["der", "die", "das", "und", "ein", "ist", "von", "zu"],
}


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: counts, lengths, type-token ratio."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
                   / F.size(toks)).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.size(F.array_distinct(toks)) / F.size(toks))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("type_token_ratio"),
    )


# BPE-style pre-tokenizer classes (letters / digit runs / symbol runs):
# the regex splits text the way byte-pair encoders pre-segment before
# merging, so piece counts approximate tokenizer token counts without
# shipping a vocab. Character classes only — portable across regex
# engines (Java on Spark executors, RE2-like in oracle engines).
BPE_WORD = "[a-zA-Z]+"
BPE_NUMBER = "[0-9]+"
BPE_OTHER = r"[^a-zA-Z0-9\s]+"
BPE_PIECE = f"{BPE_WORD}|{BPE_NUMBER}|{BPE_OTHER}"


def bpe_token_count(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE-ish piece counts (the cheap token-budget
    estimator a training pipeline runs corpus-wide before mixing)."""
    n = lambda pat: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))  # noqa: E731
    return df.select(
        F.col(id_col),
        n(BPE_PIECE).cast("long").alias("n_pieces"),
        n(BPE_WORD).cast("long").alias("n_word_pieces"),
        n(BPE_NUMBER).cast("long").alias("n_number_pieces"),
        n(BPE_OTHER).cast("long").alias("n_other_pieces"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + lexical diversity +
    alphanumeric density (the standard cheap pre-filter before expensive
    model-based scoring)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    ttr = F.when(n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    alnum_density = F.when(
        F.length(F.col(text_col)) > 0,
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
        / F.length(F.col(text_col)),
    ).otherwise(F.lit(0.0))
    length_band = F.when((n_tokens >= 10) & (n_tokens <= 5000), F.lit(1.0)).otherwise(
        F.when(n_tokens > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    score = F.round(0.4 * length_band + 0.3 * ttr + 0.3 * alnum_density, 6)
    return df.select(
        F.col(id_col),
        F.col("lang"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(alnum_density, 6).alias("alnum_density"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-anchor language guess: score per language = number of
    tokens that are in that language's stopword set; argmax with
    deterministic tie-break on language code; 'und' (undetermined) when
    no stopword hits at all."""
    toks = tokens(text_col)

    def _in_set(words):
        # closure, not default-arg: a 2nd lambda param would be read as
        # the array-index argument by F.filter's arity inspection.
        return lambda t: t.isin(words)

    scores = [
        F.size(F.filter(toks, _in_set(sw))).alias(f"score_{lang}")
        for lang, sw in LANG_STOPWORDS.items()
    ]
    scored = df.select(F.col(id_col), F.col("lang").alias("labeled_lang"), *scores)
    langs = list(LANG_STOPWORDS)
    pairs = F.array(*[
        F.struct(
            F.col(f"score_{lg}").alias("score"), F.lit(lg).alias("lang")
        )
        for lg in langs
    ])
    # argmax: sort by (score desc, lang asc) portably via array_max on
    # (score, reverse-lang) is messy — use greatest + filter instead.
    best_score = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    best_lang = F.when(best_score == 0, F.lit("und")).otherwise(
        F.element_at(
            F.filter(pairs, lambda p: p["score"] == best_score), 1
        )["lang"]
    )
    return scored.select(
        F.col(id_col),
        "labeled_lang",
        best_score.cast("long").alias("stopword_hits"),
        best_lang.alias("guessed_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Two content fingerprints per doc: md5 of normalized text (exact
    content key) and the OpenRefine-style key-collision fingerprint
    (md5 of sorted distinct tokens — order/duplication-insensitive)."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(normalize_text(text_col)).alias("content_md5"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "keyset_md5"
        ),
    )


def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style LM quality proxy: train a corpus-wide word-bigram
    language model (add-one smoothing) on the documents themselves and
    score every document by the average negative log-probability of its
    bigrams — the standard "perplexity filter" a training-data pipeline
    runs to rank documents by in-distribution-ness before mixing
    (Wenzek et al., "CCNet", 2020 use a KenLM 5-gram; the bigram form
    keeps the identical pipeline shape with a model that trains in two
    aggregations).

    Model: p(w2|w1) = (B(w1,w2) + 1) / (U(w1) + V) with B = bigram
    count, U = context count, V = corpus vocabulary size. Score =
    avg over the doc's bigram instances of -ln p; ppl = exp(score).
    Docs with < 2 tokens carry NULL score (nothing to evaluate).

    Scale notes: one explode pass over the corpus, two partial-agg
    shuffles keyed on (w1,w2) and (w1), then one join of instances back
    onto the model — also keyed (w1,w2), so AQE reuses the exchange.
    Frequent bigrams ("of the") make heavy-but-bounded partitions: the
    model side is one row per bigram, so the join has no row
    amplification and AQE skew-split handles the uneven instance side.
    The vocabulary scalar rides in on a broadcast of a 1-row aggregate.
    """
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("toks"))
    # Pairs via index transform (same pattern as repetition_stats's
    # bigrams; `toks` is a plain attribute here so the HOF doesn't
    # re-evaluate the tokenization per element).
    big = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE "
        "transform(sequence(0, size(toks)-2), "
        "i -> struct(toks[i] AS w1, toks[i+1] AS w2)) END"
    )
    inst = (
        toks_df.select(F.col(id_col), F.explode(big).alias("bg"))
        .select(F.col(id_col), F.col("bg.w1"), F.col("bg.w2"))
    )
    big_counts = inst.groupBy("w1", "w2").agg(F.count("*").alias("b_cnt"))
    ctx_counts = inst.groupBy("w1").agg(F.count("*").alias("u_cnt"))
    vocab = toks_df.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    model = (
        big_counts.join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2",
            F.log((F.col("b_cnt") + F.lit(1.0)) / (F.col("u_cnt") + F.col("v"))
                  ).alias("logp"),
        )
    )
    scored = (
        inst.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(-F.col("logp")).alias("a"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("a", 6).alias("avg_nll"),
            F.round(F.exp("a"), 4).alias("ppl"),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters: the fraction-of-repeated-content
    heuristics ("Scaling Language Models", Rae et al. 2021, table A1)
    that catch boilerplate and spam which per-token quality scores miss.

    Per document: duplicate-word fraction, most-frequent-word share,
    duplicate-bigram fraction, and a conjunctive ``keep`` flag. The word
    frequencies need a per-(doc, word) count — explode + two-level
    aggregation, both shuffling on the uniform doc id (no skew; at
    100 TB this is one well-partitioned explode pass, the same profile
    as the shingle pipeline it shares a shuffle key with).
    """
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_words"),
    )
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE "
        "transform(sequence(0, size(toks)-2), "
        "i -> concat(toks[i], ' ', toks[i+1])) END"
    )
    sized = base.withColumn("n_bigrams", F.size(bigrams).cast("long")).withColumn(
        "n_distinct_bigrams", F.size(F.array_distinct(bigrams)).cast("long")
    )
    top_word = (
        base.select(F.col(id_col), F.explode("toks").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_word_count"))
    )
    out = sized.join(top_word, id_col)
    dup_word_frac = F.round(
        1.0 - F.col("n_distinct_words") / F.col("n_words"), 6
    )
    top_word_frac = F.round(F.col("top_word_count") / F.col("n_words"), 6)
    dup_bigram_frac = F.when(
        F.col("n_bigrams") > 0,
        F.round(1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        "n_words",
        dup_word_frac.alias("dup_word_frac"),
        top_word_frac.alias("top_word_frac"),
        dup_bigram_frac.alias("dup_bigram_frac"),
        (
            (dup_word_frac <= 0.8)
            & (top_word_frac <= 0.2)
            & (dup_bigram_frac <= 0.4)
        ).alias("keep"),
    )


def dsir_importance_weights(df: DataFrame, target_filter: Column,
                            n_buckets: int = 256,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023), the hashed n-gram variant: score every document by how much
    more likely its tokens are under a TARGET-domain unigram model than
    under the raw-corpus model, in a fixed hashed feature space so no
    vocabulary is ever built or broadcast.

    ``target_filter`` marks the in-domain rows (e.g. a trusted source);
    both models are bucket-count distributions with add-1/2 smoothing,
    and the per-doc weight is the MEAN token log-ratio
    ``ln p_target(bucket(tok)) - ln p_raw(bucket(tok))``. ``keep`` is
    weight > 0 (more target-like than corpus-like) — a local predicate,
    no global ranking, so selection stays embarrassingly parallel.

    Plan shape at scale: one explode; TWO tiny aggregations (<=
    n_buckets rows each — the whole "model" is a few KB and joins back
    via broadcast); one map-side-combinable per-doc avg. The classic
    DSIR trade: hashing collisions blur the model slightly but the
    pipeline needs zero driver state and one pass.

    Buckets are 2-hex-char md5 prefixes (n_buckets=256) — the repo's
    portable bucket scheme, identical string math in the DuckDB oracle.
    """
    if n_buckets != 256:
        raise ValueError("portable md5-prefix scheme supports n_buckets=256")
    inst = df.select(
        F.col(id_col).alias("id"),
        target_filter.alias("is_target"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(
        "id", "is_target", F.substring(F.md5("tok"), 1, 2).alias("bucket")
    )
    counts = inst.groupBy("bucket").agg(
        F.count("*").alias("r_cnt"),
        F.count_if("is_target").alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    model = (
        counts.crossJoin(F.broadcast(totals))  # 1-row aggregate fold
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + 0.5) / (F.col("t_tot") + 0.5 * n_buckets))
                - F.log((F.col("r_cnt") + 0.5) / (F.col("r_tot") + 0.5 * n_buckets))
            ).alias("log_ratio"),
        )
    )
    scored = (
        inst.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("log_ratio").alias("w"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(F.coalesce("w", F.lit(0.0)), 6).alias("avg_log_ratio"),
            (F.coalesce("w", F.lit(0.0)) > 0).alias("keep"),
        )
    )


# Mojibake artifacts of UTF-8 text decoded as cp1252: the 3-byte
# punctuation range E2 80 xx surfaces as "\u00e2\u20ac" + cp1252(xx)
# (right quote, left double quote, dashes, ellipsis); 2-byte accented
# Latin C3 xx surfaces as "\u00c3" + a char in U+00A0..00BF. Escapes
# keep this source file ASCII; the compiled classes are literal-char
# sets, portable between Java regex (Spark executors) and RE2-style
# engines (oracle side).
MOJIBAKE_RE = (
    "(\u00e2\u20ac[\u2122\u0153\u02dc\u201c\u201d\u00a6])"
    "|(\u00c3[\u00a0-\u00bf])"
)
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
REPLACEMENT_CHAR = "\ufffd"


def unicode_cleanup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_bad_ratio: float = 0.01) -> DataFrame:
    """Encoding-health screen + canonicalization for a text corpus:
    count control characters, U+FFFD replacement characters (a decoder
    already gave up once upstream), and classic UTF-8-as-Latin-1
    mojibake sequences; emit a cleaned text (control chars stripped,
    whitespace collapsed, Unicode NFC-composed) and a keep flag gating
    on the bad-character ratio.

    Counting and stripping are JVM-side regex (whole-stage codegen);
    only NFC composition drops to Python — Catalyst has no Unicode
    normalizer — as an Arrow-batched pandas UDF (one normalize call
    per element of the Arrow batch, never a row-at-a-time UDF). Pure
    per-element math: no shuffle, no state, linear in corpus bytes.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_control = F.regexp_count(t, F.lit(CONTROL_RE))
    n_replacement = F.regexp_count(t, F.lit(REPLACEMENT_CHAR))
    n_mojibake = F.regexp_count(t, F.lit(MOJIBAKE_RE))
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace(t, CONTROL_RE, " "), "\\s+", " ")
    )
    bad = n_control + n_replacement + n_mojibake
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_control.cast("long").alias("n_control"),
        n_replacement.cast("long").alias("n_replacement"),
        n_mojibake.cast("long").alias("n_mojibake"),
        _nfc(stripped).alias("text_clean"),
        F.when(n_chars == 0, F.lit(False))
        .otherwise(bad / n_chars <= max_bad_ratio)
        .alias("keep"),
    )


def _nfc(col: Column) -> Column:
    """Arrow-batched NFC composition (defined lazily so importing this
    module never needs a live SparkSession for UDF registration)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def nfc_kernel(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x)
            if x is not None else None
        )

    return nfc_kernel(col)


# Markup-stripping patterns. Java regex and RE2-style engines agree on
# these constructs: non-greedy spans, case-insensitive groups via
# (?i:...), character classes. script/style/comment contents are
# dropped wholesale (code/CSS is not prose); other tags are replaced
# by a space so adjacent words don't fuse; entities decode after tags
# so "&lt;b&gt;" stays text, not markup.
HTML_DROP_RE = (
    "(?i:<script[^>]*>.*?</script>)"
    "|(?i:<style[^>]*>.*?</style>)"
    "|<!--.*?-->"
)
HTML_TAG_RE = "</?[a-zA-Z][^>]*>"
HTML_ENTITIES = {
    "&nbsp;": " ", "&amp;": "&", "&lt;": "<", "&gt;": ">",
    "&quot;": "\"", "&#39;": "'", "&apos;": "'",
}


def html_strip(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               extra_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Boilerplate-lite markup removal for web-scraped corpora: drop
    script/style/comment blocks, strip remaining tags, decode the
    common named entities, collapse whitespace. Pure JVM regex chain —
    a codegen'd map-only pass that fuses into the scan; no Python, no
    shuffle. Emits the cleaned text plus the markup-density signal
    (chars removed / chars in) used to gate pages that are mostly
    chrome rather than prose.

    Deliberately regex-scoped (tags, blocks, entities) rather than a
    full HTML5 parser: malformed-nesting recovery needs a real parser
    (lxml/trafilatura behind mapInPandas) — the signals and plan shape
    here are the production ones, and the regex subset is what the
    portable oracle can restate.
    """
    t = F.col(text_col)
    # (?s) so block contents spanning newlines are dropped
    no_blocks = F.regexp_replace(t, "(?s)" + HTML_DROP_RE, " ")
    no_tags = F.regexp_replace(no_blocks, HTML_TAG_RE, " ")
    decoded = no_tags
    for ent, rep in HTML_ENTITIES.items():
        decoded = F.replace(decoded, F.lit(ent), F.lit(rep))
    clean = F.trim(F.regexp_replace(decoded, "\\s+", " "))
    n_in = F.length(t)
    n_out = F.length(clean)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],  # pass-through (keeps composed
        clean.alias("text_clean"),        # pipelines one linear chain)
        n_in.cast("long").alias("n_chars_in"),
        n_out.cast("long").alias("n_chars_out"),
        F.round(
            F.when(n_in > 0, (n_in - n_out) / n_in).otherwise(F.lit(0.0)), 6
        ).alias("markup_density"),
    )


def bpe_encode_words(vocab: DataFrame, merges: list[tuple[str, str]],
                     word_col: str = "w") -> DataFrame:
    """Apply a ranked BPE merge table to a vocabulary relation:
    (word) -> (word, pieces array, n_pieces).

    Classic greedy BPE: start from characters, repeatedly merge the
    adjacent pair with the LOWEST merge rank until no listed pair
    remains. The merge table is a model artifact (50-50k rows) shipped
    to executors via the UDF closure — the same broadcast economics as
    k-means centroids.

    Deliberately applied to the VOCABULARY, not the corpus: Zipf means
    |vocab| << corpus tokens, so the Python kernel (Arrow-batched; the
    loop is per unique word) touches each distinct word once and the
    corpus-sized work stays JVM-side as a join + aggregate in the
    caller. A per-batch memo makes repeated words within a batch free.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def encode_kernel(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms = (
                    syms[:best_i]
                    + [syms[best_i] + syms[best_i + 1]]
                    + syms[best_i + 2:]
                )
            memo[word] = syms
            return syms

        return words.map(lambda w: enc(w) if w is not None else None)

    return vocab.select(
        F.col(word_col).alias("w"),
        encode_kernel(F.col(word_col)).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("long"))


def bpe_encode_stats(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE encoding statistics under a given merge table:
    token count, piece count, pieces-per-token (the token-budget
    number a training pipeline actually bills by).

    Plan: explode tokens -> distinct vocab -> Python encode over vocab
    only -> join piece counts back on the word -> per-doc sum. Both
    corpus-sized shuffles key on the word / doc id; the vocab relation
    is the only Python input."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w")
    )
    vocab = toks.select("w").distinct()
    encoded = bpe_encode_words(vocab, merges).select("w", "n_pieces")
    per_doc = (
        toks.join(encoded, "w")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) > 0,
                    F.col("n_pieces") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("pieces_per_token"),
        )
    )


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 5) -> DataFrame:
    """C4-style line/document hygiene (Raffel et al. 2020, §2.2): keep
    only lines that end in terminal punctuation and carry at least
    ``min_words_per_line`` words, drop lines mentioning javascript,
    and gate the document on curly braces, "lorem ipsum", and a
    >= 3-sentence minimum over the retained text.

    Entirely JVM higher-order functions over the line array (filter /
    transform / array_join) — a shuffle-free map pass that fuses into
    the scan; the oracle restates the identical lambda chain with
    DuckDB list functions.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    trimmed = F.transform(lines, lambda l: F.trim(l))
    kept = F.filter(
        trimmed,
        lambda l: (F.length(l) > 0)
        & (F.regexp_count(l, F.lit('[.!?"]$')) > 0)
        & (F.size(F.split(l, " +")) >= min_words_per_line)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(clean, F.lit("[.!?]"))
    has_brace = F.contains(t, F.lit("{"))
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        clean.alias("text_clean"),
        n_sentences.cast("long").alias("n_sentences"),
        (
            ~has_brace & ~has_lorem & (n_sentences >= 3)
        ).alias("keep"),
    )


# Gopher quality-rule thresholds (Rae et al. 2021, table A1 subset) —
# module-level so the oracle SQL generator reads the same numbers.
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_gate(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021): token
    count band, mean word length band, symbol-to-word ratio, fraction
    of words containing an alphabetic character, and a minimum
    stopword-hit count (the "is this prose at all" test). One
    shuffle-free pass of higher-order array math; every signal is
    emitted alongside the gate so downstream mixing can re-weight
    instead of hard-dropping."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)) / n_tok,
    ).otherwise(F.lit(0.0))
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[#]|\.\.\."), 0)
    )
    alpha_frac = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))) / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(GOPHER_STOPWORDS))
    )
    keep = (
        n_tok.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & mean_wlen.between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
        & (
            F.when(n_tok > 0, n_symbols / n_tok).otherwise(F.lit(0.0))
            <= GOPHER_MAX_SYMBOL_RATIO
        )
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        n_symbols.cast("long").alias("n_symbols"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        keep.alias("keep"),
    )
