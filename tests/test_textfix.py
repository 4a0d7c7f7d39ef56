"""ftfy-equivalent text cleanup (``models/clip/textfix.py``).

The reference tokenizer's ``basic_clean`` runs ``ftfy.fix_text`` then a
double ``html.unescape`` (``modelzoo/clip/simple_tokenizer.py:50-53``).
These tests pin the stdlib re-implementation on the behaviors ftfy's
default pipeline applies — mojibake repair, surrogates, ligatures,
fullwidth folding, curly quotes, control chars — and the no-false-positive
cases (genuine accented text must pass through untouched).
"""
import pytest

from quantize_tpu.models.clip.textfix import fix_encoding, fix_text
from quantize_tpu.models.clip.tokenizer import basic_clean, whitespace_clean


@pytest.mark.parametrize("src,want", [
    # UTF-8 misdecoded as Latin-1 (the classic mojibake ftfy exists for)
    ("caffÃ¨ macchiato", "caffè macchiato"),
    ("naÃ¯ve", "naïve"),
    ("SÃ£o Paulo", "São Paulo"),
    ("Ã©lÃ¨ve", "élève"),
    # UTF-8 misdecoded as cp1252 (curly quote bytes land in 0x80-0x9F)
    ("â€œquotedâ€\x9d", '"quoted"'),
    ("donâ€™t", "don't"),
])
def test_mojibake_repair(src, want):
    assert fix_text(src) == want


def test_double_mojibake_repair():
    twice = ("caffè".encode("utf-8").decode("latin-1")
                     .encode("utf-8").decode("latin-1"))
    assert fix_text(twice) == "caffè"


@pytest.mark.parametrize("text", [
    "plain ascii",
    "déjà vu",            # real Latin-1-range text: must NOT be "repaired"
    "São Paulo",
    "München",
    "日本語のテキスト",      # CJK passes through
    "emoji 😀 stays",
])
def test_no_false_positive(text):
    assert fix_text(text) == text


def test_ligatures_and_width():
    assert fix_text("ﬁsh ﬂy ﬀ") == "fish fly ff"
    # ftfy keeps the long s in the U+FB05 expansion ("ſt", not NFKC's "st")
    assert fix_text("ﬅop ﬆop") == "ſtop stop"
    assert fix_text("ＡＢＣ１２３") == "ABC123"
    # blanket NFKC would rewrite these; ftfy's NFC default does not
    assert fix_text("E=mc²") == "E=mc²"
    assert fix_text("½ cup") == "½ cup"


def test_quotes_controls_linebreaks():
    assert fix_text("it’s “fine”") == "it's \"fine\""
    assert fix_text("x\x1b[31mred\x1b[0m") == "xred"
    assert fix_text("a\rb\r\nc d") == "a\nb\nc\nd"
    assert fix_text("nul\x00l bel\x07l") == "null bell"


def test_surrogate_repair():
    broken = "😀"  # unpaired surrogates for U+1F600
    assert fix_text(broken) == "😀"


def test_fix_encoding_idempotent():
    s = fix_encoding("caffÃ¨")
    assert fix_encoding(s) == s == "caffè"


def test_basic_clean_pipeline():
    # fix_text + double html.unescape, like the reference's basic_clean
    assert basic_clean("a photo of a caffÃ¨, naÃ¯ve style.") == \
        "a photo of a caffè, naïve style."
    assert basic_clean("&amp;amp; x") == "& x"
    assert whitespace_clean(basic_clean("  a\tphoto\n of ")) == "a photo of"


def test_mojibake_classname_tokenizes_like_clean(tmp_path):
    """End-to-end: a mojibake classname must produce the same token ids as
    its clean form through the real BPE tokenizer."""
    from quantize_tpu.models.clip.tokenizer import BPETokenizer

    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nl o\nlo w\ne r</w>\n")
    tok = BPETokenizer(str(p))
    clean = tok.encode("a photo of a caffè.")
    moji = tok.encode("a photo of a caffÃ¨.")
    assert clean == moji
