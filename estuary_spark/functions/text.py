"""Text analysis for large-scale training-data pipelines.

All hot-path functions are built-in ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen) — no Python UDFs. Each is designed to be
expressible in portable ANSI-ish SQL so the DuckDB oracle can verify it
(see __spark_entry__.py).

estuary parity note: the reference's only scalar text handling is SQL
literal escaping and date formatting (SURVEY.md §2.10); this module is the
engine's training-data extension mandated by the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A tiny fixed stopword list per language — enough for a deterministic
# n-gram/stopword language-ID heuristic (public-knowledge word lists).
STOPWORDS_EN = ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"]
STOPWORDS_ES = ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"]
STOPWORDS_FR = ["le", "la", "les", "des", "une", "est", "dans", "pour", "que", "sur"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"]

TOKEN_RE = "[A-Za-z0-9]+"           # word tokens
BPE_ISH_RE = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"  # words + punctuation marks


def tokens(col: Column) -> Column:
    """Word tokens (lowercased)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: word pieces + individual punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def n_chars(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    nonspace = F.length(F.regexp_replace(col, "\\s", ""))
    punct = F.length(F.regexp_replace(col, "[A-Za-z0-9\\s]", ""))
    return F.when(nonspace == 0, F.lit(0.0)).otherwise(punct / nonspace)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of word tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length band + low punctuation +
    reasonable stopword density (a C4/Gopher-style heuristic filter)."""
    n = F.length(col)
    len_ok = F.when((n >= 20) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    p = punct_ratio(col)
    punct_ok = F.when(p <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    s = stopword_ratio(col)
    sw_ok = F.when((s >= 0.01) & (s <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 6)


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit counts per language (the n-gram-heuristic language ID)."""
    toks = tokens(col)
    out = {}
    for lang, sw in (
        ("en", STOPWORDS_EN),
        ("es", STOPWORDS_ES),
        ("fr", STOPWORDS_FR),
        ("de", STOPWORDS_DE),
    ):
        arr = F.array(*[F.lit(w) for w in sw])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all 0.

    Deterministic tie-break by language code order en > es > fr > de.
    """
    sc = lang_scores(col)
    best = F.greatest(*sc.values())
    # first matching language in priority order wins ties (when chain)
    expr = F.when((sc["en"] > 0) & (sc["en"] == best), F.lit("en"))
    for lang in ("es", "fr", "de"):
        expr = expr.when((sc[lang] > 0) & (sc[lang] == best), F.lit(lang))
    return expr.otherwise(F.lit("und"))


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """Normalized-content fingerprint (stable document identity)."""
    return F.md5(normalize_text(col))


def fingerprint_rolling(col: Column, prime: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over the normalized text's characters —
    a classic Rabin-Karp document fingerprint, computed with the built-in
    higher-order ``aggregate`` (no Python in the loop)."""
    norm = normalize_text(col)
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % prime,
    )
