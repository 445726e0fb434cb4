"""BPE training vs a pure-Python Sennrich reference: identical merge
lists (greedy argmax with deterministic tiebreak), correct overlapping-
run semantics, and inference consistency."""

from __future__ import annotations

from collections import Counter

from ubdc_airbnb_spark.operators import bpe
from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
EOW = bpe.EOW


def _py_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference implementation of the training loop."""
    state = {w: tuple(w) + (EOW,) for w in word_freqs}
    merges = []
    for step in range(n_merges):
        pc: Counter = Counter()
        for w, syms in state.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((step, a, b, cnt))
        new_state = {}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, state


def test_bpe_train_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents").limit(60)
    got = [
        (r.step, r.left, r.right, r.cnt)
        for r in bpe.bpe_train(docs, n_merges=12).orderBy("step").collect()
    ]
    wf = {
        r.word: r.freq
        for r in bpe.word_frequencies(docs, "doc_id", "text").collect()
    }
    want, _ = _py_bpe(wf, 12)
    assert got == want and len(got) == 12


def test_merge_pair_overlapping_run_semantics(spark):
    """'a a a a a' with merge (a,a) must yield ['aa','aa','a'] — greedy
    left-to-right, non-overlapping, exactly the reference algorithm."""
    state = spark.createDataFrame(
        [("aaaaa", ["a", "a", "a", "a", "a"], 1)], "word string, syms array<string>, freq long"
    )
    [r] = bpe.merge_pair(state, "a", "a").collect()
    assert r.syms == ["aa", "aa", "a"]


def test_apply_bpe_segments_with_learned_merges(spark):
    docs = load_table(spark, SF, "documents").limit(60)
    merges_df = bpe.bpe_train(docs, n_merges=8)
    merges = [(r.left, r.right) for r in merges_df.orderBy("step").collect()]
    seg = {
        (r.doc_id, r.word): r.pieces
        for r in bpe.apply_bpe(docs, merges).collect()
    }
    # python replay on a sample of words
    wf = {
        r.word: r.freq for r in bpe.word_frequencies(docs, "doc_id", "text").collect()
    }
    _, state = _py_bpe(wf, 8)
    for (did, w), pieces in list(seg.items())[:200]:
        assert tuple(pieces) == state[w], (w, pieces, state[w])
    # every segmentation reassembles to the word + marker
    for (did, w), pieces in seg.items():
        assert "".join(pieces) == w + EOW
