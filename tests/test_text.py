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
