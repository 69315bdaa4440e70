"""Distributed BPE merge training (q203): the learned merge sequence
equals a pure-Python reference BPE run on the same word-frequency
table — iteration count, argmax tie-breaks, greedy merge application
all match."""

from collections import Counter

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.mining import BPE_MERGES, q203_bpe_train
from flightdb_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs, n_merges):
    """Textbook BPE on a {word: freq} dict with (count desc, pair asc)
    tie-break and greedy left-to-right merge application."""
    vocab = {tuple(w): f for w, f in word_freqs.items() if w}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == a and x == b:
                    out.append(a + b)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference(spark):
    load_registry()
    docs = load_table(spark, SF_DIR, "documents")
    wf = {
        r.word: r.freq
        for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    want = _reference_bpe(wf, BPE_MERGES)
    got = [
        (r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in q203_bpe_train(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == want


def test_bpe_encode_matches_reference(spark):
    from flightdb_spark.queries.mining import q211_bpe_encode

    docs = load_table(spark, SF_DIR, "documents")
    rows = docs.select("doc_id", "text").collect()
    wf = {}
    for r in rows:
        for w in r.text.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges = _reference_bpe(wf, BPE_MERGES)

    def encode(word):
        syms = list(word)
        for a, b, m, _ in merges:
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == a and x == b:
                    out.append(m)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            syms = out
        return syms

    want = {}
    for r in rows:
        words = [w for w in r.text.split(" ") if w]
        if not words:
            continue
        enc = [encode(w) for w in words]
        want[r.doc_id] = (
            len(words),
            sum(len(w) for w in words),
            sum(len(e) for e in enc),
        )
    got = {
        r.doc_id: (r.n_words, r.n_char_tokens, r.n_bpe_tokens)
        for r in q211_bpe_encode(spark, SF_DIR).collect()
    }
    assert got == want
