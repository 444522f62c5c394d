"""Text-analysis kernel contracts (dedup/similarity/lang-ID/quality)."""

import hashlib

from raptor_rag_spark.kernels.textstats import (
    fingerprint,
    hamming16,
    jaccard,
    lang_id,
    minhash_signature,
    norm_tokens,
    portable_hash63,
    quality_score,
    rolling_fingerprint,
    shingles,
    simhash,
)


def test_portable_hash_matches_md5_prefix():
    expected = int(hashlib.md5(b"abc").hexdigest()[:15], 16)
    assert portable_hash63("abc") == expected == 648541476951500027


def test_shingles():
    assert shingles("a b c d", 3) == ["a b c", "b c d"]
    assert shingles("a b", 3) == ["a b"]
    assert shingles("", 3) == []


def test_minhash_identical_texts_equal_signatures():
    s1 = minhash_signature("the quick brown fox jumps over the lazy dog")
    s2 = minhash_signature("the quick brown fox jumps over the lazy dog")
    assert s1 == s2
    assert len(s1) == 16


def test_minhash_similar_texts_share_bands():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    sa, sb = minhash_signature(a), minhash_signature(b)
    matches = sum(x == y for x, y in zip(sa, sb))
    assert matches >= 4  # high Jaccard → many matching minhashes


def test_minhash_empty():
    assert minhash_signature("") == [0] * 16


def test_simhash_similarity():
    a = simhash("spark engine join shuffle partition broadcast")
    b = simhash("spark engine join shuffle partition broadcast agg")
    c = simhash("completely different words entirely unrelated topic")
    assert hamming16(a, a) == 0
    assert hamming16(a, b) < hamming16(a, c)
    assert 0 <= a < 2**16


def test_jaccard():
    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("", "") == 1.0
    assert jaccard("a b c", "x y z") == 0.0


def test_fingerprint_normalizes_whitespace_and_case():
    assert fingerprint("Hello   World") == fingerprint("hello world")
    assert fingerprint("a") != fingerprint("b")


def test_rolling_fingerprint_deterministic():
    t = "one two three four five six seven eight nine ten"
    assert rolling_fingerprint(t) == rolling_fingerprint(t)
    assert rolling_fingerprint("") == 0


def test_lang_id():
    assert lang_id("the cat and the dog of the house") == "en"
    assert lang_id("der Hund und die Katze und das Haus") == "de"
    assert lang_id("le chat et la maison et les arbres") == "fr"
    assert lang_id("xyzzy qwerty plugh") == "und"


def test_quality_score_bounds():
    assert quality_score("") == 0.0
    q = quality_score("the quick brown fox jumps over the lazy dog")
    assert 0.0 < q <= 1.0
    # longer, diverse text scores higher than tiny text
    long = " ".join(f"word{i}" for i in range(300))
    assert quality_score(long) > quality_score("hi")


def test_norm_tokens():
    assert norm_tokens("Hello, World! 42") == ["hello", "world", "42"]
