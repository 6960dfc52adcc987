"""HTML boilerplate-strip goldens + idempotence (SURVEY §5.2.5).

Hand-written pages covering the classic boilerplate shapes: nav bars,
footers, link farms, script/style noise, headings, multilingual
stopwords. Golden expectations are exact strings — any heuristic
change must consciously update them.
"""

from __future__ import annotations

from pdf_extractor_spark.operators.html_extract import extract_html

PAGE = """<!DOCTYPE html><html><head>
<title>  The   Example
Title </title>
<script>var x = track("evil");</script>
<style>.nav{color:red}</style>
</head><body>
<header><nav><ul>
  <li><a href="/">Home</a></li><li><a href="/about">About</a></li>
  <li><a href="/contact">Contact</a></li>
</ul></nav></header>
<main><article>
  <h1>Understanding the System</h1>
  <p>The quick brown fox jumps over the lazy dog and keeps on running
     through the forest with a purpose.</p>
  <h2>Background and Context</h2>
  <p>It is a truth universally acknowledged that a single paragraph in
     possession of stopwords must be in want of extraction.</p>
  <p><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a>
     <a href="/d">four</a> <a href="/e">five</a></p>
  <p>Short frag.</p>
</article></main>
<aside><p>The best related links you will ever see in this sidebar of
  the page are here.</p></aside>
<footer><p>© 2025 example.com — <a href="/terms">terms</a> and
  <a href="/privacy">privacy</a></p></footer>
</body></html>"""


def test_golden_extraction():
    res = extract_html(PAGE.encode())
    assert res["title"] == "The Example Title"
    assert res["outline"] == [
        {"level": "H1", "text": "Understanding the System", "page": 0},
        {"level": "H2", "text": "Background and Context", "page": 0},
    ]
    lines = res["main_text"].split("\n")
    # headings + the two prose paragraphs survive — nothing else
    assert lines[0] == "Understanding the System"
    assert lines[1].startswith("The quick brown fox")
    assert lines[2] == "Background and Context"
    assert lines[3].startswith("It is a truth universally acknowledged")
    assert len(lines) == 4
    # dropped: link-farm para, short frag (aside/nav/footer subtrees
    # never reach the block list at all)
    assert res["n_dropped"] == 2
    joined = res["main_text"]
    for boiler in ("Home", "Contact", "©", "related links", "one", "Short frag"):
        assert boiler not in joined


def test_title_falls_back_to_h1():
    res = extract_html(b"<html><body><h1>Only Heading Here</h1><p>The body of it is long enough to keep for sure.</p></body></html>")
    assert res["title"] == "Only Heading Here"


def test_link_density_gate():
    linky = b'<html><body><p><a href="x">click here now</a> <a href="y">and also here</a></p></body></html>'
    assert extract_html(linky)["main_text"] == ""
    prose = b"<html><body><p>Plain words with the usual density of a sentence and more.</p></body></html>"
    assert extract_html(prose)["main_text"] != ""


def test_multilingual_stopwords():
    de = b"<html><body><p>Der Hund und die Katze sind ein gutes Beispiel von Texten.</p></body></html>"
    fr = b"<html><body><p>Le chat et le chien sont des animaux de la maison tranquille.</p></body></html>"
    assert extract_html(de)["n_kept"] == 1
    assert extract_html(fr)["n_kept"] == 1


def test_idempotence():
    """Re-extracting the extracted output (headings re-wrapped as
    their heading tags, prose as paragraphs) must reproduce it
    unchanged — the heuristics never eat their own output."""
    first = extract_html(PAGE.encode())
    heads = {e["text"]: e["level"].lower().replace("h", "h") for e in first["outline"]}
    parts = []
    for line in first["main_text"].split("\n"):
        if line in heads:
            tag = "h" + heads[line][-1]
            parts.append(f"<{tag}>{line}</{tag}>")
        else:
            parts.append(f"<p>{line}</p>")
    second = extract_html(("<html><body>" + "".join(parts) + "</body></html>").encode())
    assert second["main_text"] == first["main_text"]
    assert second["outline"] == first["outline"]


def test_malformed_html_does_not_raise():
    for junk in (b"<p>unclosed", b"<<<>>>", b"", b"\xff\xfe\x00garbage", b"<a><a><a>x</b></i>"):
        res = extract_html(junk)
        assert set(res) == {"title", "main_text", "outline", "n_kept", "n_dropped"}


def test_bad_marked_section_keeps_rest_of_page():
    """CPython's HTMLParser raises AssertionError / NotImplementedError
    from _markupbase on `<![` + garbage or unknown marked-section
    keywords (sweep finding: a whole page died for one bad declaration).
    The tolerant override skips the declaration like a bogus comment and
    the surrounding prose survives; MS conditional comments too."""
    before = "Before text stays with plenty of ordinary words inside it."
    after = "After text also stays with plenty of ordinary words too."
    res = extract_html(
        f"<p>{before}</p><![\x1b\xf4\xe5junk><p>{after}</p>".encode("latin-1")
    )
    assert before in res["main_text"] and after in res["main_text"]
    res2 = extract_html(
        f"<p>{before}</p><![if !IE]><p>{after}</p><![endif]>".encode()
    )
    assert before in res2["main_text"] and after in res2["main_text"]
    # trailing unterminated declaration: no crash, prior text survives
    res3 = extract_html(f"<p>{before}</p><![\x02".encode("latin-1"))
    assert before in res3["main_text"]
