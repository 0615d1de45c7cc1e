"""Tokenizer-training primitives: byte-pair-encoding statistics and the
merge-learning loop (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") — the stage of an LLM data pipeline
that sits between corpus assembly and training.

Spark shape: BPE statistics decompose over the WORD-FREQUENCY table
(count words once, then weight symbol-pair counts by word frequency) —
so the corpus-size work is one word-count shuffle, and every merge
iteration runs on the |vocab|-row word frame, not the corpus. That is
exactly how production BPE trainers scale: corpus → word histogram
(distributed), merges → loop over the histogram (cheap).

Everything is deterministic: ties in pair frequency break on the pair
string, so the learned merge sequence is reproducible across runs and
engines (pytest pins it against a pure-Python reference implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) frequency table — the only corpus-size aggregation."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _chars(word_col: F.Column) -> F.Column:
    """Character array of a word (trailing empty-string artifact of
    split-by-empty-pattern removed by slicing to the word length)."""
    return F.slice(F.split(word_col, ""), 1, F.length(word_col))


def pair_counts(words: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over a (word, wc,
    [syms]) frame (one BPE statistics pass). Output (left, right,
    pair_count) — the pair is kept as its two symbols, never a
    concatenated string (concatenation is ambiguous once merged symbols
    exist: "ab"+"c" vs "a"+"bc").

    zip_with of two slices builds the pair list per word (map-only);
    the only shuffle is the |pairs|-key count aggregate.
    """
    syms = F.col("syms")
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        words.select("wc", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wc").alias("pair_count"))
    )


def with_symbols(words: DataFrame) -> DataFrame:
    """Attach the initial character-level symbol array."""
    return words.withColumn("syms", _chars(F.col("word")))


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge rule (left, right) -> left||right to every word's
    symbol array — a single aggregate fold per word (left-to-right,
    non-overlapping, the standard BPE application order), map-only.
    """
    merged = F.lit(left + right)
    folded = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return words.withColumn("syms", folded)


def learn_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[str, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns [(left, right, merged, count), ...] in learned order. Each
    iteration: pair-count the word frame, take the (count desc, pair
    asc) argmax — ONE two-row driver read per merge — then fold the
    winning rule into the symbol arrays. The word frame is
    localCheckpoint'ed per iteration (loop-invariant materialization,
    same discipline as the k-means/NN-Descent loops): without it every
    iteration would replay the whole merge chain.
    """
    words = with_symbols(word_histogram(df, text_col)).localCheckpoint()
    rules: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        rules.append((left, right, left + right, int(cnt)))
        words = apply_merge(words, left, right).localCheckpoint()
    return rules
