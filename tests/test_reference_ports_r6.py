"""Round-6 reference-suite ports + regressions (continues
tests/test_reference_ports_r5.py — reference: /root/reference/tests/).

Each test pins EXACT expected output so any divergence from the
reference's semantics fails loudly.
"""

import pytest

from pdfplumber_spark import api

PDFS = "/root/reference/tests/pdfs"


def test_layout_mode_keeps_render_directions():
    """Round-5 ADVICE (api.py:391): layout=True used to rebuild
    layout_kwargs with dict(...), discarding the captured
    line_dir_render/char_dir_render — the exact bug the round-5 port fix
    claimed to close. The render directions must reorder layout-mode
    output exactly as in non-layout mode (reference text.py:241-420
    passes them to both assemblers)."""
    page = api.open(f"{PDFS}/line-char-render-example.pdf").pages[0]
    plain = page.extract_text(layout=True)
    flipped = page.extract_text(
        layout=True, line_dir_render="btt", char_dir_render="rtl"
    )
    assert plain != flipped
    # line order inverted, chars mirrored within each line (modulo the
    # trailing-space padding layout mode emits per line)
    p_lines = [ln.strip() for ln in plain.splitlines() if ln.strip()]
    f_lines = [ln.strip() for ln in flipped.splitlines() if ln.strip()]
    assert f_lines == [ln[::-1] for ln in reversed(p_lines)]


def test_chars_always_carry_mcid_tag_keys():
    """Round-5 ADVICE (api.py:716): the reference emits mcid/tag keys
    (None-valued) on EVERY char, tagged page or not (page.py:208-216
    process_object attrs) — the chars schema must not depend on whether
    the document has marked content."""
    # untagged fixture: keys present, all None
    page = api.open(f"{PDFS}/line-char-render-example.pdf").pages[0]
    ch = page.chars[0]
    assert "mcid" in ch and "tag" in ch
    assert ch["mcid"] is None and ch["tag"] is None
    assert {"mcid", "tag"} <= set(page._chars.columns)
    # tagged fixture: real values survive unchanged
    tagged = api.open(f"{PDFS}/mcid_example.pdf").pages[0]
    assert {"mcid", "tag"} <= set(tagged._chars.columns)
    assert any(c["mcid"] is not None for c in tagged.chars)
