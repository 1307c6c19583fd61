"""BPE tokenizer TRAINING on a corpus — learn merge rules, apply them
distributed.

The scale decomposition real BPE trainers (SentencePiece, HF
tokenizers) use, mapped onto Spark:

1. **Corpus → word-frequency table** (distributed): one groupBy over
   lowercased whitespace words. This is the only pass that touches
   corpus-scale data; 100 TB of text reduces to a vocabulary-sized
   (word, count) table. A ``top_words`` cap bounds driver memory —
   merge statistics from the frequency head are what BPE learns from
   anyway (the Zipf tail contributes noise, not merges).
2. **Merge learning** (driver, vocabulary-sized state): the classic
   greedy loop — count adjacent symbol pairs weighted by word
   frequency, merge the most frequent pair, repeat. Deterministic
   tie-break on the pair itself.
3. **Apply** (distributed): encode any corpus with the learned merge
   ranks via an Arrow-batched pandas UDF — merges apply in rank order
   per word, exactly like inference-time BPE.

``textstats.bpe_tokens`` remains the cheap regex APPROXIMATION of a
byte-pair vocabulary; this module is the real learned thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_words: int = 50_000
) -> list[tuple[str, int]]:
    """(word, count) head of the corpus frequency table — ONE
    distributed aggregation, then a bounded driver collect."""
    freq = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(top_words)
    )
    return [(r["w"], r["n"]) for r in freq.collect()]


def learn_merges(
    word_freq: list[tuple[str, int]], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Greedy BPE merge rules from a word-frequency table (pure
    Python, vocabulary-sized state). Words are char sequences with a
    </w> end marker; each round merges the globally most frequent
    adjacent pair (count desc, pair asc tie-break — deterministic)."""
    vocab = {tuple(w) + ("</w>",): n for w, n in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats — further merges are memorization
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learned merge rules for this corpus (steps 1+2 above)."""
    return learn_merges(word_frequencies(docs, text_col, top_words), n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): corpus encoded with the
    learned merges — Arrow-batched, merge table broadcast by closure,
    per-word LRU memoization inside the batch (Zipf makes the cache
    hit rate high)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").lower().split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {"id": pdf[id_col], "tokens": toks, "n_tokens": counts}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, "id long, tokens array<string>, n_tokens int"
    )
