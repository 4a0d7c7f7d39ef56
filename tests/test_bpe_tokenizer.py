"""The REAL BPE tokenizer, exercised on a synthetic merges vocabulary.

The reference vendors ``bpe_simple_vocab_16e6.txt.gz`` and runs its BPE on
every zero-shot prompt (``modelzoo/clip/simple_tokenizer.py:62-131``,
``clip/clip.py:205-245``). That data is not copied here (and this env has
no egress), so a small merges file built IN-TEST drives the real merge
loop, ``</w>`` handling, SOT/EOT framing, 77-token truncation, and the
``class_prompt_tokens`` pipeline — against hand-computed expectations.

Vocabulary id layout (mirrors the reference's construction): 256 base
byte-unicode chars, then the same 256 with ``</w>``, then one id per merge,
then ``<|startoftext|>``, ``<|endoftext|>``.
"""
import numpy as np
import pytest

from quantize_tpu.models.clip.tokenizer import (BPETokenizer, bytes_to_unicode,
                                                tokenize)

# classic GPT-2 BPE teaching example: "lower" -> ["low", "er</w>"]
MERGES = ["l o", "lo w", "e r</w>"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("bpe") / "merges.txt"
    p.write_text("#version: 0.2 (synthetic test vocab)\n" + "\n".join(MERGES) + "\n")
    return BPETokenizer(str(p))


def _char_id(c: str) -> int:
    """Base-char id = position in the byte-unicode vocab list."""
    return list(bytes_to_unicode().values()).index(c)


def _char_w_id(c: str) -> int:
    return 256 + _char_id(c)


def _merge_id(i: int) -> int:
    return 512 + i


def test_vocab_layout(tok):
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.sot_token == tok.vocab_size - 2
    assert tok.eot_token == tok.vocab_size - 1
    assert tok.encoder["low"] == _merge_id(1)
    assert tok.encoder["er</w>"] == _merge_id(2)


def test_multi_step_merge(tok):
    # l+o -> lo, lo+w -> low, e+r</w> -> er</w>
    assert tok.bpe("lower") == "low er</w>"
    assert tok.encode("lower") == [_merge_id(1), _merge_id(2)]


def test_partial_merge_falls_back_to_chars(tok):
    # "lowest": low merges, e/s/t stay chars, t carries </w>
    assert tok.bpe("lowest") == "low e s t</w>"
    assert tok.encode("lowest") == [
        _merge_id(1), _char_id("e"), _char_id("s"), _char_w_id("t")]


def test_single_char_word_gets_word_end(tok):
    assert tok.encode("a") == [_char_w_id("a")]


def test_word_end_merge_only_applies_at_word_end(tok):
    # "er" mid-word must NOT use the er</w> merge
    assert tok.bpe("erg") == "e r g</w>"


def test_contraction_and_case_and_whitespace(tok):
    # regex splits 't; cleanup lowercases and collapses whitespace
    assert tok.encode("LOWER   isn't") == (
        [_merge_id(1), _merge_id(2)]
        + [_char_id(c) for c in "isn"][:-1] + [_char_w_id("n")]
        + [_char_id("'")] + [_char_w_id("t")])


def test_decode_round_trip(tok):
    ids = tok.encode("lower lowest")
    assert tok.decode(ids) == "lower lowest "  # </w> -> trailing spaces


def test_tokenize_frames_sot_eot(tok):
    out = tokenize(["lower"], tokenizer=tok)
    assert out.shape == (1, 77)
    row = out[0]
    assert row[0] == tok.sot_token
    assert list(row[1:3]) == [_merge_id(1), _merge_id(2)]
    assert row[3] == tok.eot_token
    assert (row[4:] == 0).all()


def test_tokenize_truncates_preserving_eot(tok):
    out = tokenize(["lower " * 100], tokenizer=tok)
    row = out[0]
    assert row.shape == (77,)
    assert row[0] == tok.sot_token
    assert row[-1] == tok.eot_token
    assert (row[1:-1] != 0).all()


def test_class_prompt_tokens_through_real_bpe(tok):
    from quantize_tpu.models.clip import class_prompt_tokens

    toks = class_prompt_tokens(["lower", "lowest"],
                               prompts=["a photo of a {}."],
                               tokenizer=tok, context_length=77)
    assert toks.shape == (2, 1, 77)
    # "a photo of a lower." -> a / p h o t o / o f / a / low er</w> / .
    row = toks[0, 0]
    assert row[0] == tok.sot_token
    ids = list(row[row != 0][1:])  # strip SOT, padding
    assert ids[-1] == tok.eot_token
    # the classname's BPE-merged ids appear in the prompt encoding
    assert _merge_id(1) in ids and _merge_id(2) in ids
    # 'photo': p,h,o,t each base chars, final o carries </w>
    sub = [_char_id("p"), _char_id("h"), _char_id("o"), _char_id("t"),
           _char_w_id("o")]
    s = "," .join(map(str, ids))
    assert ",".join(map(str, sub)) in s


def test_byte_fallback_non_ascii(tok):
    # a multi-byte utf-8 char maps through the byte encoder, one id per byte
    ids = tok.encode("é")
    assert len(ids) == 2  # 2 utf-8 bytes, no merges apply
    assert tok.decode(ids).strip() == "é"
