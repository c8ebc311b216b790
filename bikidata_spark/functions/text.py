"""Text-analysis functions for large-scale training-data pipelines.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen;
no Python in the hot path). Tokenization matches the engine-wide
contract (SURVEY.md §6): lowercase, split on ``[^a-z0-9]+``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.fts import TOKEN_SPLIT_RE, tokens_col
from ..session import ensure_parallelism

# deterministic stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "que", "por"],
}
STOPWORDS_EN = LANG_PROFILES["en"]


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars) — whitespace/punct token counting."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, alpha ratio, stopword ratio,
    mean token length — the standard cheap pre-filters for LLM corpus
    cleaning. All integer counts + one exact division at the end."""
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (n_alpha.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double")).alias("alpha_ratio"),
        (n_stop.cast("double") / F.nullif(n_tok, F.lit(0)).cast("double")).alias("stop_ratio"),
        (
            (n_tok >= 5)
            & (n_chars >= 20)
            & (n_stop > 0)
        ).alias("quality_ok"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID. Deterministic argmax with a fixed
    profile order for ties ('en' > 'de' > 'fr' > 'es' > 'und')."""
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_PROFILES.items()
    }
    order = list(LANG_PROFILES)
    # first-match CASE: a profile wins if nonzero and >= every later one
    pred = F.lit("und")
    for lang in reversed(order):
        later = order[order.index(lang) + 1 :]
        cond = scores[lang] > 0
        for other in later:
            cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in order],
        pred.alias("pred_lang"),
    )
    return out


# deliberately simple patterns that behave identically in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+]?[0-9][0-9()\\- ]{7,}[0-9]"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails/phone-like spans; report counts.
    (id, clean_text, n_emails, n_phones) — a standard corpus-cleaning
    stage; pure JVM regex."""
    df = ensure_parallelism(df)
    n_emails = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
    )


URL_RE = "https?://[^ \\t\\n\\r]+"
DOMAIN_RE = "https?://([^/ \\t\\n\\r]+)"


def url_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """URL extraction / scrubbing — the boilerplate-and-link-spam stage
    of a corpus-cleaning pipeline: (id, n_urls, n_domains,
    url_density, clean_text). ``n_domains`` counts DISTINCT lowercased
    hosts; ``url_density`` is URLs per whitespace token (link farms
    score high); ``clean_text`` replaces each URL with ``<URL>``. Pure
    JVM regex — the patterns are POSIX-simple so an external engine
    (DuckDB oracle) evaluates them identically."""
    df = ensure_parallelism(df)
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    domains = F.array_distinct(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(DOMAIN_RE), F.lit(1)),
            F.lower,
        )
    )
    n_toks = F.size(F.split(F.trim(F.col(text_col)), "[ \\t\\n\\r]+"))
    return df.select(
        F.col(id_col),
        F.size(urls).cast("long").alias("n_urls"),
        F.size(domains).cast("long").alias("n_domains"),
        F.round(
            F.when(n_toks > 0, F.size(urls) / n_toks).otherwise(F.lit(0.0)), 6
        ).alias("url_density"),
        F.regexp_replace(F.col(text_col), URL_RE, "<URL>").alias("clean_text"),
    )


def vocabulary(df: DataFrame, text_col: str, min_count: int = 2) -> DataFrame:
    """Corpus vocabulary: (token, n) for tokens occurring >= min_count
    times. One explode + one map-side-combined groupBy."""
    df = ensure_parallelism(df)
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized document fingerprint: md5 of the token stream — the
    canonical near-exact dedup key (whitespace/punct/case-insensitive)."""
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fp"),
    )


def repetition_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Within-document repetition signals (the Gopher-rule family,
    token-weighted): per document,

    - ``dup_line_frac`` — fraction of non-empty lines that are repeats
      of an earlier line (0 when single-line);
    - ``top_{top_n}gram_frac`` — tokens covered by the single most
      frequent ``top_n``-gram, over total tokens;
    - ``dup_{dup_n}gram_frac`` — tokens covered by ``dup_n``-grams that
      occur more than once (all occurrences), over total tokens; may
      exceed 1 because overlapping grams each claim their tokens;
    - ``repetition_ok`` — passes all three thresholds (0.30 / 0.20 /
      0.60, the standard cut points for corpus cleaning).

    Line stats are pure array expressions (no shuffle). Gram stats are
    one explode + two map-side-combinable groupBys keyed by the doc id —
    work stays proportional to corpus token count, no joins across
    documents, so the plan scales linearly and partitions by id."""
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = (
        F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
        )
        .otherwise(F.lit(0.0))
    )
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        dup_line_frac.alias("dup_line_frac"),
        toks.alias("_ts"),
    )

    def grams(k: int):
        # every k-gram, NOT distinct — counts need multiplicity
        return F.when(
            F.size(F.col("_ts")) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("_ts")) - k + 1),
                lambda i: F.array_join(F.slice(F.col("_ts"), i, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    tagged = base.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    grams(top_n),
                    lambda g: F.struct(F.lit(top_n).alias("n"), g.alias("g")),
                ),
                F.transform(
                    grams(dup_n),
                    lambda g: F.struct(F.lit(dup_n).alias("n"), g.alias("g")),
                ),
            )
        ).alias("ng"),
    ).select(F.col(id_col), F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    counts = tagged.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    stats = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == top_n, F.col("c"))).alias("_top_c"),
        F.sum(
            F.when((F.col("n") == dup_n) & (F.col("c") > 1), F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("_dup_c"),
    )
    top_c = F.coalesce(F.col("_top_c"), F.lit(0))
    dup_c = F.coalesce(F.col("_dup_c"), F.lit(0))
    nt = F.col("n_tokens")
    top_frac = F.when(nt > 0, (F.lit(top_n) * top_c).cast("double") / nt).otherwise(
        F.lit(0.0)
    )
    dup_frac = F.when(nt > 0, (F.lit(dup_n) * dup_c).cast("double") / nt).otherwise(
        F.lit(0.0)
    )
    return (
        base.select(F.col(id_col), "n_tokens", "dup_line_frac")
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            nt,
            F.col("dup_line_frac"),
            top_frac.alias(f"top_{top_n}gram_frac"),
            dup_frac.alias(f"dup_{dup_n}gram_frac"),
            (
                (F.col("dup_line_frac") <= 0.30)
                & (top_frac <= 0.20)
                & (dup_frac <= 0.60)
            ).alias("repetition_ok"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
) -> DataFrame:
    """Fixed-size token chunking for sequence packing: one row per
    (id, chunk_id) with the chunk's text and its token count (the last
    chunk may be short; empty documents yield no chunks). A narrow
    per-row explode — no shuffle, scales linearly with corpus tokens."""
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    staged = df.select(F.col(id_col), toks.alias("_ts"))
    n = F.size(F.col("_ts"))
    n_chunks = F.floor((n + chunk_tokens - 1) / F.lit(chunk_tokens))
    exploded = staged.filter(n > 0).select(
        F.col(id_col),
        F.col("_ts"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * chunk_tokens
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(
            F.slice(F.col("_ts"), (start + 1).cast("int"), chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.size(F.col("_ts")) - start)
        .cast("long")
        .alias("n_tokens"),
    )


def md5_permille(id_col: str, salt: str) -> Column:
    """Deterministic 0-999 bucket from the first 8 md5 hex chars of
    ``salt:id`` — the shared reproducible-sampling primitive behind
    ``hash_split`` and ``sample_mixture`` (fuzz-checked to agree with
    Python's hashlib and DuckDB's md5 in test_cross_engine_fuzz)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    train_permille: int = 900,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation assignment: (id, split) where
    split = 'train' iff the first 8 md5 hex chars of ``salt:id`` land
    under ``train_permille``/1000. Stable across runs, partitionings
    and engines (the standard reproducible-split idiom for corpus
    prep — no RNG state, no shuffle; a pure map)."""
    bucket = md5_permille(id_col, salt)
    return df.select(
        F.col(id_col),
        F.when(bucket < train_permille, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )
