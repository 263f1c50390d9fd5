import pytest

from tortoise_tpu.text import Tokenizer

TOKENIZER_JSON = "/root/reference/models/tokenizer.json"


@pytest.fixture(scope="module")
def tok():
    return Tokenizer.from_file(TOKENIZER_JSON)


def test_vocab_specials(tok):
    assert tok.token_to_id["[STOP]"] == 0
    assert tok.token_to_id["[UNK]"] == 1
    assert tok.token_to_id["[SPACE]"] == 2
    assert len(tok.token_to_id) == 255
    assert len(tok.merge_rank) == 215


# --- greedy mode: parity with the reference's runtime gpt_tokenize -------
# Goldens below were captured from a g++ build of the reference tokenizer
# (common.cpp gpt_vocab_init + gpt_tokenize) on these exact inputs.


def test_greedy_dr_freeman(tok):
    ids = tok.encode("based...[SPACE]doctor[SPACE]freeman?")
    assert ids == [15, 55, 49, 9, 9, 9, 2, 134, 16, 51, 31, 2, 130, 18, 225, 43, 13]


def test_greedy_test_message(tok):
    ids = tok.encode("this[SPACE]is[SPACE]a[SPACE]test[SPACE]message")
    assert ids == [147, 2, 54, 2, 14, 2, 136, 63, 2, 80, 32, 150, 112]


def test_greedy_diffusion_complete(tok):
    ids = tok.encode("diffusion[SPACE]model[SPACE]complete!")
    assert ids == [17, 140, 19, 142, 107, 2, 115, 126, 25, 2, 170, 178, 18, 136, 3]


def test_quirk_vocab_version_word():
    # The reference's flat-scan json_parse maps the literal word "version"
    # to id 1 (stoi of the top-level "version":"1.0" pair) and drops the
    # "[STOP]" key. Captured from the g++ harness.
    qt = Tokenizer.from_file(TOKENIZER_JSON, reference_quirks=True)
    assert qt.encode("a[SPACE]version[SPACE]of[SPACE]identity") == [
        14, 2, 1, 2, 58, 2, 208, 27, 78, 210,
    ]
    assert "[STOP]" not in qt.token_to_id


# --- bpe mode: parity with upstream tortoise-tts ids (the ids hardcoded in
# the reference's seeded tests, main.cpp:6267-6269 and 5047-5063) ----------


def test_bpe_dr_freeman(tok):
    ids = tok.encode("based...[SPACE]doctor[SPACE]freeman?", method="bpe")
    assert ids == [15, 55, 49, 9, 9, 9, 2, 134, 16, 51, 31, 2, 19, 46, 18, 176, 13]


def test_bpe_test_message(tok):
    ids = tok.encode("this[SPACE]is[SPACE]a[SPACE]test[SPACE]message", method="bpe")
    assert ids == [147, 2, 54, 2, 14, 2, 33, 218, 2, 26, 61, 150, 112]


def test_bpe_diffusion_complete(tok):
    ids = tok.encode("diffusion[SPACE]model[SPACE]complete!", method="bpe")
    assert ids == [17, 140, 19, 142, 107, 2, 115, 126, 25, 2, 170, 29, 64, 136, 3]


def test_pipeline_wrapping(tok):
    ids = tok.encode_pipeline("this is a test message")
    assert ids[0] == 255 and ids[-1] == 0
    assert ids[1:-1] == [147, 2, 54, 2, 14, 2, 136, 63, 2, 80, 32, 150, 112]


def test_unknown_chars_dropped(tok):
    # Characters outside the vocab are skipped with no placeholder.
    assert tok.encode("a~b") == tok.encode("ab") or tok.encode("a~b") == [
        tok.token_to_id["a"],
        tok.token_to_id["b"],
    ]


def test_specials_inside_words(tok):
    assert tok.encode("[SPACE]") == [2]
    assert tok.encode("x[STOP]y") == [tok.token_to_id["x"], 0, tok.token_to_id["y"]]


def test_greedy_longest_match(tok):
    # "the" exists as one token; greedy must not emit t+h+e
    assert tok.encode("the") == [tok.token_to_id["the"]]


def test_native_and_python_encoders_agree(tok):
    try:
        from tortoise_tpu.native import NativeTokenizer  # noqa: F401

        native_tok = Tokenizer.from_file(TOKENIZER_JSON)
        assert native_tok._native is not None
    except Exception:
        import pytest

        pytest.skip("native lib not built")
    py_tok = Tokenizer(tok.token_to_id, native=False)
    for text in [
        "this[SPACE]is[SPACE]a[SPACE]test[SPACE]message.",
        "based...[SPACE]doctor[SPACE]freeman?",
        "x[STOP]y", "", "a~b", "the[SPACE]the",
        # one regex word producing >4096 ids must not truncate
        "m" * 5000,
        # embedded NUL inside a word: the native ABI takes an explicit
        # byte length (a NUL-terminated API silently dropped the tail)
        "a!\x00!b",
        # lone surrogate (json.loads accepts \ud800 escapes): the native
        # plane can't UTF-8-encode it and must fall back per word
        "ab\ud800cd",
    ]:
        assert native_tok.encode(text) == py_tok.encode(text), repr(text)


def test_native_encoder_thread_safe(tok):
    """Concurrent encodes (the serve HTTP layer tokenizes on handler
    threads) must not corrupt each other — a shared output buffer once
    let one thread read another's ids."""
    try:
        native_tok = Tokenizer.from_file(TOKENIZER_JSON)
        assert native_tok._native is not None
    except Exception:
        import pytest

        pytest.skip("native lib not built")
    import threading

    texts = ["this[SPACE]is[SPACE]a[SPACE]test[SPACE]message." * 8,
             "based...[SPACE]doctor[SPACE]freeman?" * 8,
             "the[SPACE]quick[SPACE]brown[SPACE]fox" * 8,
             "m" * 3000]
    expected = [native_tok.encode(t) for t in texts]
    errors = []

    def worker(idx):
        for _ in range(50):
            if native_tok.encode(texts[idx]) != expected[idx]:
                errors.append(idx)
                return

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(texts)) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"corrupted encodes from threads {errors}"


def test_unknown_method_rejected(tok):
    import pytest

    with pytest.raises(ValueError, match="unknown tokenizer method"):
        tok.encode("hi", method="Greedy")


def test_bpe_merges_normalize_space_symbols(tmp_path):
    """A tokenizer.json whose merges use the HF 'Gdot' space symbol must
    still rank space-prefixed merges after key normalization (the vocab
    keys were normalized but the merge pairs were not, stalling every
    space-bearing merge)."""
    import json

    spec = {
        "model": {
            "vocab": {"[STOP]": 0, "h": 1, "i": 2, "Ġ": 3, "Ġh": 4,
                      "Ġhi": 5, "hi": 6, "[SPACE]": 7},
            "merges": ["Ġ h", "Ġh i", "h i"],
        }
    }
    p = tmp_path / "tok.json"
    p.write_text(json.dumps(spec))
    tok = Tokenizer.from_file(str(p))
    assert tok.merge_rank == {(" ", "h"): 0, (" h", "i"): 1, ("h", "i"): 2}
    assert tok.encode(" hi", method="bpe") == [5]
