"""Text analysis functions: langid, quality, tokens, fingerprint."""

import pyarrow as pa
import pytest

from bitquery_kafka_streams_rust_ray.functions.text import (
    TextAnalyzer,
    bpe_token_count,
    char_ngrams,
    detect_lang,
    jaccard,
    quality_score,
    rolling_fingerprint,
    tokens,
)


def test_tokens():
    assert tokens("a  b\tc\nd") == ["a", "b", "c", "d"]
    assert tokens("") == []


def test_bpe_token_count():
    assert bpe_token_count("hello world") == 2
    assert bpe_token_count("abc123!") == 3  # letters, digits, symbol
    assert bpe_token_count("") == 0


def test_detect_lang():
    assert detect_lang("the cat and the dog sat on the mat for a while") == "en"
    assert detect_lang("der hund und die katze ist nicht da") == "de"
    assert detect_lang("le chat et les chiens dans la maison") == "fr"
    assert detect_lang("el perro y la casa de los gatos") == "es"
    assert detect_lang("xyzzy qwerty plugh") == ""
    assert detect_lang("") == ""


def test_quality_score_bounds_and_determinism():
    good = "the quick brown fox jumps over the lazy dog and runs away"
    assert 0.0 < quality_score(good) <= 1.0
    assert quality_score(good) == quality_score(good)
    assert quality_score("") == 0.0
    assert quality_score("!!! ... ;;;") < quality_score(good)


def test_rolling_fingerprint_stability():
    a = rolling_fingerprint("some document text here")
    assert a == rolling_fingerprint("some document text here")
    # winnowing property: near-identical docs may share the fingerprint,
    # but unrelated content should not
    assert a != rolling_fingerprint("entirely unrelated words and phrases")
    assert isinstance(rolling_fingerprint(""), int)


def test_char_ngrams_and_jaccard():
    assert char_ngrams("abcd", 3) == {"abc", "bcd"}
    assert char_ngrams("AB  cd", 3) == {"ab ", "b c", " cd"}
    assert jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert jaccard({"a"}, {"b"}) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_text_analyzer_batch():
    t = pa.table({"text": ["the cat and the dog runs for the hills", None, ""]})
    out = TextAnalyzer()(t)
    assert out["token_count"].to_pylist() == [9, 0, 0]
    assert out["lang_id"].to_pylist()[0] == "en"
    assert out["quality"].to_pylist()[1] == 0.0
    assert len(out["fingerprint"].to_pylist()) == 3


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_matches_replay():
    """Distributed BPE training is identical to a single-process
    replay of the same rule (word-frequency table, max-count merge,
    ties to the lexicographic smallest pair, left-to-right
    non-overlapping rewrite)."""
    from collections import Counter

    import pandas as pd
    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.queries import bpe_train_documents

    sf = "/root/testdata/sf0.01"
    got = bpe_train_documents(sf, n_merges=8)

    texts = pq.read_table(sf + "/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    wf: Counter = Counter()
    for t in texts:
        wf.update((t or "").split())
    words = {w: (list(w), n) for w, n in wf.items()}
    rows = []
    for step in range(8):
        pc_: Counter = Counter()
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += n
        if not pc_:
            break
        (a, b), cnt = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((step, a, b, cnt))
        for w, (syms, n) in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = (res, n)
    ref = pd.DataFrame(rows, columns=["step", "left", "right", "n"]
                       ).astype({"step": "int64", "n": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_bpe_encode_matches_training_rewrite():
    """Encoding with the learned ranked merge list must reproduce the
    segmentation the TRAINING rewrite left behind: replay training's
    sequential merge application on the word-frequency table and check
    every document's token count against the distributed encoder
    (lowest-rank-first greedy == sequential-by-rank, because a merge's
    parts always exist before the merge is learnable)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.queries import (
        bpe_encode_documents, bpe_train_documents)

    sf = "/root/testdata/sf0.001"
    got = bpe_encode_documents(sf, n_merges=10)
    merges = bpe_train_documents(sf, n_merges=10)

    tbl = pq.read_table(sf + "/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    wf: Counter = Counter()
    for t in texts.values():
        wf.update((t or "").split())
    words = {w: list(w) for w in wf}
    for a, b in zip(merges["left"], merges["right"]):
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    tok_len = {w: len(s) for w, s in words.items()}

    for _, row in got.iterrows():
        ws = (texts[row["doc_id"]] or "").split()
        assert row["n_words"] == len(ws)
        assert row["n_chars"] == sum(len(w) for w in ws)
        assert row["n_tokens"] == sum(tok_len[w] for w in ws), row["doc_id"]
