"""Text-analysis operators for LLM data pipelines ([EXT], BASELINE.json
north star): tokenization, shingling, quality scoring, language ID,
fingerprinting, TF-IDF.

All built from Catalyst higher-order array functions (transform / filter /
aggregate / explode) — JVM-side, no Python in the hot path. Each helper
returns Column expressions so queries compose them declaratively and the
optimizer sees through them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic English stopword list (public knowledge) used for
# the language-ID heuristic and stopword-ratio quality signal.
EN_STOPWORDS = (
    "the of and to in a is that it for on with as are was at by an be this "
    "from or which you not have has had they his her its our their we"
).split()


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lowercased, empty tokens dropped)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


_BIG = 1 << 30


def word_shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles over the token array.

    Built by n-1 offset zip_with joins (shingle_i = tok_i .. tok_{i+n-1})
    rather than per-shingle ``slice`` — slice inside transform is O(len)
    per element (O(len²) per doc) and measured 6x slower. zip_with pads
    the shorter side with nulls, so the result is trimmed to the valid
    len-n+1 prefix.
    """
    acc = toks
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, _BIG),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        F.size(toks) >= n, F.slice(acc, 1, F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are stopwords (per-token, not distinct)."""
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop_tokens = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop_tokens / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic: favors mid-length docs with normal
    word lengths and some stopword mass (boilerplate/garbage score low)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(toks)
    wl = mean_token_len(toks)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * 0.4 + sw * 0.3 + wl_score * 0.3, 6)


def en_score(toks: Column) -> Column:
    """Language-ID heuristic: fraction of tokens that are English
    stopwords (n-gram-profile stand-in; deterministic and oracle-friendly)."""
    return stopword_ratio(toks)


def chunk_spans(toks: Column, chunk_tokens: int, overlap: int = 0) -> Column:
    """Array of (chunk_id, start, len) structs splitting a token array into
    fixed-token-budget chunks with ``overlap`` tokens of context between
    consecutive chunks — the standard pre-tokenization splitting step of a
    training-data pipeline.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may be short; an empty
    doc yields no chunks. Pure built-in expressions: the caller explodes
    the result (a narrow, shuffle-free transformation), so chunking 100 TB
    is embarrassingly parallel and Catalyst still prunes/pushes scans.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    n = F.size(toks)
    # number of chunks: 1 + ceil((n - chunk_tokens) / stride) for n > 0
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.greatest(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)), F.lit(0)
        )
    )
    idx = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    return F.when(
        n_chunks > 0,
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("chunk_id"),
                (i * stride).alias("start"),
                F.least(F.lit(chunk_tokens), n - i * stride).alias("len"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_id:int,start:int,len:int>>"))


def build_vocab(df, text_col: str, max_size: int = 1 << 20):
    """Frequency-ranked vocabulary table (token, token_id, freq): id 0 is
    the most frequent token; ties break lexicographically so the mapping
    is deterministic across runs/partitionings. One explode + hash-agg
    over the corpus (map-side combined), then a rank over the (tiny)
    vocabulary — the corpus never shuffles beyond the token counts."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Truncate BEFORE ranking: orderBy+limit compiles to a distributed
    # TakeOrdered, so the single-partition row_number window below only
    # ever sees <= max_size rows — ranking the full distinct-token set
    # through one window task would straggle/OOM on a web-scale corpus.
    top = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(max_size)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return top.withColumn("token_id", F.row_number().over(w) - 1).select(
        "token", "token_id", "freq"
    )


def encode_tokens(df, id_col: str, text_col: str, vocab, oov_id: int = -1):
    """Encode each document's token stream as an int-id array using a
    vocabulary table — the tokenizer-vocab mapping step before training.

    Scale shape: posexplode keeps token order, the vocab joins BROADCAST
    (a vocabulary is small by construction), and one groupBy per doc
    reassembles the ordered id array. Out-of-vocabulary tokens get
    ``oov_id``. The only corpus shuffle is the per-doc regroup."""
    # posexplode_outer keeps zero-token documents as one null-pos row, so
    # an empty/whitespace-only doc still appears in the output as ([], 0)
    # instead of silently vanishing from the corpus
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(tokens(text_col)).alias("pos", "token")
    )
    joined = exploded.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    ids = F.transform(
        F.filter(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("token_id").alias("tid")))
            ),
            lambda x: x["pos"].isNotNull(),
        ),
        lambda x: F.coalesce(x["tid"], F.lit(oov_id)),
    )
    return joined.groupBy(id_col).agg(
        ids.alias("token_ids"), F.count("pos").cast("long").alias("n_tokens")
    )


def doc_fingerprint(text: Column | str, shingle_n: int = 4) -> Column:
    """Document fingerprint: minimum md5 over word n-gram shingles (a
    rolling-hash analog). md5 is the one hash both Spark and DuckDB share,
    which keeps the fingerprint oracle-checkable; swap xxhash64 for speed
    when parity doesn't matter."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    sh = word_shingles(toks, shingle_n)
    # Fallback for docs shorter than one shingle hashes the tokens rejoined
    # with single spaces (NOT the raw lowered text): repeated/tab/newline
    # whitespace must fingerprint identically to its normalized form, and
    # it keeps the value reproducible by engines that split differently.
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: F.md5(s)))
    ).otherwise(F.md5(F.concat_ws(" ", toks)))


def distinct_stopword_count(toks: Column) -> Column:
    """Number of distinct stopwords present (Gopher's 'contains at least
    N stopwords' hard-filter signal; per-type, unlike stopword_ratio's
    per-token fraction)."""
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(
        F.array_distinct(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ).cast("long")
