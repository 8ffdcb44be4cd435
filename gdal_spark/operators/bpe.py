"""BPE tokenizer — train + encode over a document corpus.

Public algorithm (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units"; the GPT-2 tokenizer's training
recipe): pre-tokenize into words, count word frequencies, then
repeatedly merge the most frequent adjacent symbol pair. The merge
LIST (ordered) is the tokenizer; encoding applies merges by rank.

Spark split — the same bounded-histogram pattern as the median-cut
PCT: the DATA-SIZED stages are distributed (the corpus word count is
one codegen split+explode+groupBy whose output is the DISTINCT-WORD
histogram, and encoding is an Arrow-batched kernel over documents);
the merge loop runs driver-side over that bounded histogram —
exactly how reference BPE trainers operate (they never stream the
corpus per merge; they fold the word histogram). ``max_words`` +
``min_count`` cap the driver state explicitly; words beyond the cap
only lose their VOTE in merge selection (encoding still handles
them, falling back through merges to characters).

Determinism: pair-count ties break lexicographically, so the merge
list is a pure function of the histogram — repartition-proof and
seed-free.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: GPT-2-style pre-tokenizer (simplified, no lookahead): word pieces
#: with leading space folded in, number runs, punctuation runs.
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

END = "</w>"  # end-of-word marker (Sennrich's convention)


def word_histogram(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(word, cnt) corpus histogram — pure codegen: regexp split +
    explode + one map-side-combined groupBy. The shuffle carries
    distinct words per partition, never the corpus."""
    src = f"lower({text_col})" if lowercase else text_col
    # the SQL string literal consumes one level of backslashes
    sql_re = PRETOKEN_RE.replace("\\", "\\\\")
    words = F.explode(
        F.expr(f"regexp_extract_all({src}, '{sql_re}', 0)")
    ).alias("word")
    return (
        docs.select(words)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    hist: DataFrame | list[tuple[str, int]],
    num_merges: int = 200,
    min_count: int = 2,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Sennrich merge loop over the (bounded) word histogram.

    ``hist``: the :func:`word_histogram` DataFrame (collected here,
    top-``max_words`` by count — the ONLY driver-sized state, like
    the 32768-cell median-cut histogram) or a plain list for tests.
    Returns the ordered merge list [(left, right), ...]."""
    if isinstance(hist, DataFrame):
        rows = (
            hist.filter(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), "word")
            .limit(max_words)
            .collect()
        )
        counts = [(r["word"], int(r["cnt"])) for r in rows]
    else:
        counts = [(w, c) for w, c in hist if c >= min_count]

    # word list: (symbols, count) — plus the standard subword-nmt
    # incremental index (pair -> counts, pair -> words containing it)
    # so each merge only touches AFFECTED words instead of refolding
    # the whole vocabulary: O(occurrences) per merge, not O(vocab).
    words: list[list[str]] = []
    wcnt: list[int] = []
    for w, c in counts:
        words.append(list(w) + [END])
        wcnt.append(c)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, sym in enumerate(words):
        c = wcnt[wi]
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, lexicographically-smallest tiebreak -> deterministic
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_count:
            break
        merges.append((a, b))
        ab = a + b
        affected = pair_words.pop((a, b), set())
        pair_counts.pop((a, b), None)
        for wi in affected:
            sym = words[wi]
            c = wcnt[wi]
            # remove this word's old pair contributions
            for p in zip(sym, sym[1:]):
                if p in pair_counts:
                    pair_counts[p] -= c
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(wi)
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            # add back the new contributions
            for p in zip(out, out[1:]):
                if p == (a, b):
                    continue  # fully merged away this round
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Encode documents -> (id, tokens array<string>, n_tokens).
    Arrow-batched kernel; per-batch word cache exploits Zipf (most
    words repeat, so the merge loop runs once per DISTINCT word per
    batch). The merge table ships in the closure (a few kB)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pat = re.compile(PRETOKEN_RE)
    lc = lowercase

    def gen(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, toks, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if lc:
                    text = text.lower()
                out: list[str] = []
                for w in pat.findall(text):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(did)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": ns}
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, tokens array<string>, n_tokens long"
    )


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of the word-level encode: concatenate, split words at
    END markers (lossy only in whitespace/case, by construction of
    the pre-tokenizer — pinned in tests)."""
    return " ".join(
        w for w in "".join(tokens).split(END) if w
    )
