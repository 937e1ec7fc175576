"""HTML boilerplate stripper (kernel/htmlstrip.py) — the north rule's
"from-scratch DOM boilerplate stripper (text-density + tag heuristics)".
Deterministic kernel behavior pins; the Spark path byte-identity is covered
by the corpus extraction tests (same code, Arrow-batched)."""

import pytest

from pdfplumber_spark.kernel.htmlstrip import (
    extract_main_text,
    extract_main_text_bytes,
)


DOC = """<!DOCTYPE html><html><head><title>T</title>
<script>var x = "this must never appear";</script>
<style>p{color:red}</style></head>
<body>
<header><nav><a href="/a">Home</a> <a href="/b">About us page</a></nav></header>
<div class="sidebar"><a href="#">Related story one here</a>
<a href="#">Related story two here</a></div>
<article>
<h1>The actual headline of the article</h1>
<p>First paragraph with enough words to be kept by the density rule.</p>
<p>Second paragraph also has plenty of meaningful content words.</p>
<p>ok</p>
</article>
<footer>copyright example corp <a href="/a">Home</a></footer>
</body></html>"""


def test_main_content_kept_boilerplate_dropped():
    out = extract_main_text(DOC)
    assert "actual headline" in out
    assert "First paragraph" in out and "Second paragraph" in out
    # chrome containers and their text never appear
    assert "Home" not in out
    assert "About us" not in out
    assert "Related story" not in out
    assert "copyright" not in out
    # script/style content dropped entirely
    assert "never appear" not in out
    assert "color:red" not in out
    # short blocks (< 3 words) dropped
    assert "\nok" not in out and not out.endswith("ok")


def test_link_density_rule():
    html = (
        "<body><p><a href='x'>all of this text is one giant link "
        "block</a></p><p>normal prose paragraph with real words</p></body>"
    )
    out = extract_main_text(html)
    assert "normal prose" in out
    assert "giant link" not in out


def test_whitespace_collapsed_and_blocks_joined():
    html = "<body><p>a   b\n\n c d</p><p>e  f g h</p></body>"
    assert extract_main_text(html) == "a b c d\ne f g h"


def test_single_block_fallback():
    # documents with no block passing the filters fall back to the longest
    assert extract_main_text("<body><p>hi there</p></body>") == "hi there"
    assert extract_main_text("") == ""
    assert extract_main_text("<body></body>") == ""


def test_malformed_and_undecodable_payloads():
    # truncated / garbage markup must not raise
    assert isinstance(extract_main_text("<div><p>unclosed everything"), str)
    out = extract_main_text_bytes(
        b"<body><p>caf\xe9 latin-1 bytes not utf-8 here</p></body>"
    )
    assert "caf\xe9" in out
    assert isinstance(extract_main_text_bytes(b"\xff\xfe\x00garbage"), str)


def test_entity_decoding():
    out = extract_main_text(
        "<body><p>fish &amp; chips &lt;today&gt; only</p></body>"
    )
    assert out == "fish & chips <today> only"


def test_deterministic():
    assert extract_main_text(DOC) == extract_main_text(DOC)
