"""Golden tests of the CLIP BPE tokenizer vs HuggingFace CLIPTokenizer
(constructed offline from the same public merges table), pinning parity
with the reference's vendored tokenizer (simple_tokenizer.py, clip.py:
206-247)."""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from dropclip_tpu.teachers.tokenizer import (  # noqa: E402
    CONTEXT_LENGTH,
    ClipTokenizer,
    default_tokenizer,
    tokenize,
)

SAMPLES = [
    "a photo of a red mug",
    "The Quick Brown FOX!!! jumps... over 123 lazy dogs?",
    "object", "thing", "texture", "stuff",
    "a 3d render of a cluttered tabletop scene",
    "it's a knife,a spoon and a fork",
    "weird   whitespace\tand\nnewlines",
    "hyphen-ated und unicode: naïve café",
]


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    tk = default_tokenizer()
    d = tmp_path_factory.mktemp("hf_clip_tok")
    vocab_file = d / "vocab.json"
    merges_file = d / "merges.txt"
    vocab_file.write_text(json.dumps(tk.encoder, ensure_ascii=False))
    merges = [" ".join(pair) for pair, _ in
              sorted(tk.rank.items(), key=lambda kv: kv[1])]
    merges_file.write_text("#version: 0.2\n" + "\n".join(merges))
    from transformers import CLIPTokenizer

    return CLIPTokenizer(str(vocab_file), str(merges_file))


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_matches_hf(hf_tok, text):
    ours = list(default_tokenizer().encode(text))  # encode returns a tuple
    theirs = hf_tok(text)["input_ids"][1:-1]  # strip SOT/EOT
    assert ours == theirs, (text, ours, theirs)


def test_tokenize_matrix_layout():
    mat = tokenize(["a photo of a cat", "dog"])
    tk = default_tokenizer()
    assert mat.shape == (2, CONTEXT_LENGTH)
    assert mat.dtype == np.int32
    assert mat[0, 0] == tk.sot
    row = mat[1]
    eot_pos = int(np.argmax(row))  # EOT is the highest id in the row
    assert row[eot_pos] == tk.eot
    assert np.all(row[eot_pos + 1:] == 0)


def test_tokenize_truncation():
    long = "cat " * 200
    with pytest.raises(RuntimeError):
        tokenize(long)
    mat = tokenize(long, truncate=True)
    tk = default_tokenizer()
    assert mat.shape == (1, CONTEXT_LENGTH)
    assert mat[0, -1] == tk.eot


def test_decode_roundtrip():
    tk = default_tokenizer()
    text = "a photo of a red mug"
    assert tk.decode(tk.encode(text)).strip() == text


def test_fix_text_ftfy_equivalent():
    """Serve-path text repair (reference pipes prompts through
    ftfy.fix_text, simple_tokenizer.py:50-54): mojibake re-decode, NFC,
    control-char strip; identity on ASCII."""
    from dropclip_tpu.teachers.tokenizer import fix_text, tokenize

    assert fix_text("the red mug") == "the red mug"          # ASCII identity
    assert fix_text("cafÃ©") == "café"        # utf8-as-latin1
    double = ("café".encode("utf-8").decode("latin-1")
              .encode("utf-8").decode("latin-1"))
    assert fix_text(double) == "café"                   # double-encoded
    assert fix_text("a\x00b\tc") == "ab\tc"                  # control-char strip
    # NFC: decomposed e + combining acute -> single codepoint
    assert fix_text("café") == "café"
    # format chars (Cf) survive like ftfy: ZWJ carries meaning in emoji
    # sequences and Indic scripts; only Cc/Cs/Co/Cn are dropped
    zwj = "\N{ZERO WIDTH JOINER}"
    assert fix_text("a" + zwj + "b\x07c") == "a" + zwj + "bc"
    # tokenize accepts repaired text without raising
    assert tokenize(["cafÃ© au lait"]).shape == (1, 77)
