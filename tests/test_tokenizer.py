"""Byte-level BPE tokenizer: training, roundtrip, specials, serde, and
native-vs-Python encode parity (the C++ path must be bit-identical)."""
import pytest

from neuronika_tpu.data.tokenizer import BpeTokenizer, _pretokenize

CORPUS = (
    "the quick brown fox jumps over the lazy dog\n"
    "the quicker they come, the quicker they go\n"
    "pack my box with five dozen liquor jugs\n"
) * 20


@pytest.fixture(scope="module")
def tok():
    return BpeTokenizer.train([CORPUS], vocab_size=300,
                              special_tokens=["<|end|>"])


@pytest.mark.parametrize("text", [
    "the quick brown fox",
    "Hello world!  multiple   spaces\n\ttabs too",
    "def f(x):\n    return x * 2  # comment",
    "unicode: café → \U0001F600 ok",
    "", " ", "   ", "a", " a", "\n\n\n",
])
def test_roundtrip_exact(tok, text):
    assert tok.decode(tok.encode(text)) == text


def test_compression_and_growth(tok):
    ids = tok.encode("the quick brown fox jumps over the lazy dog")
    raw = len("the quick brown fox jumps over the lazy dog".encode())
    assert len(ids) < raw // 2          # merges actually compress
    assert any(i >= 256 for i in ids)   # merged ids in use
    assert tok.vocab_size == 300


def test_training_deterministic():
    a = BpeTokenizer.train([CORPUS], vocab_size=280)
    b = BpeTokenizer.train([CORPUS], vocab_size=280)
    assert a.merges == b.merges


def test_special_tokens(tok):
    eid = tok.special_id("<|end|>")
    assert eid == tok.vocab_size - 1
    ids = tok.encode("the fox<|end|>the dog")
    assert ids.count(eid) == 1
    assert tok.decode(ids) == "the fox<|end|>the dog"
    # a special token is never produced from plain text
    assert eid not in tok.encode("the fox the dog")


def test_save_load_roundtrip(tok, tmp_path):
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BpeTokenizer.load(p)
    s = "the quick brown fox<|end|>"
    assert tok2.encode(s) == tok.encode(s)
    assert tok2.vocab_size == tok.vocab_size


def test_pretokenizer_gpt2_space_semantics():
    # a whitespace run leaves its last space to the following word
    parts = _pretokenize(b"a   b\tc \td")
    assert parts == [b"a", b"  ", b" b", b"\t", b"c", b" ", b"\t", b"d"]


def test_vocab_too_small_raises():
    with pytest.raises(ValueError, match="vocab_size"):
        BpeTokenizer.train(["x"], vocab_size=100)


def test_native_matches_python(tok):
    pytest.importorskip("neuronika_tpu.data._native_bpe")
    text = (CORPUS + "tail with unseen wordzz\n  spaces   \t"
            + "mixed \tword \t\n x\t\ty  \tz")  # ws-run edge cases
    native = tok._encode_plain(text.encode())
    pure = []
    for w in _pretokenize(text.encode()):
        pure.extend(tok._encode_word(w))
    assert native == pure


def test_encode_batch(tok):
    outs = tok.encode_batch(["the fox", "the dog"])
    assert outs == [tok.encode("the fox"), tok.encode("the dog")]
