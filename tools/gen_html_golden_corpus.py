#!/usr/bin/env python
"""Generate the adversarial HTML golden corpus (round-3 verdict #4).

Writes tests/fixtures/html_golden/<name>.html (exact payload BYTES —
several fixtures are deliberately mis-encoded, truncated, or spliced
with binary) and expected.json = the frozen extract_html() output for
every fixture.  tests/test_html_golden_corpus.py replays the committed
bytes and byte-compares against expected.json, so ANY behavior change
in operators/html_extract.py fails loudly and requires rerunning this
script (`python tools/gen_html_golden_corpus.py --update`) and
reviewing the expected.json diff — the same pin tests/refimpl.py gives
the PDF analyzer.

The corpus is real-world-shaped: every fixture models a failure class
observed in crawled HTML (nested nav/footer boilerplate, inline JS
templates, broken encodings, RTL text, tag soup, link farms,
tables-as-layout, space-free scripts, truncation, binary splice).
All content is synthetic; generation is fully deterministic (seeded
rng for filler only).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT_DIR = REPO / "tests" / "fixtures" / "html_golden"

_LOREM = (
    "the quick brown fox jumps over the lazy dog while a curious reader "
    "follows along and wonders what the point of this sentence is"
).split()


def _prose(rng: random.Random, n_words: int = 30) -> str:
    return " ".join(rng.choice(_LOREM) for _ in range(n_words)).capitalize() + "."


def _nav_links(items: list[str]) -> str:
    return "".join(f'<a href="/{t.lower().replace(" ", "-")}">{t}</a> ' for t in items)


def build_fixtures() -> dict[str, bytes]:
    rng = random.Random(20260818)
    f: dict[str, bytes] = {}

    # ---- boilerplate shapes -------------------------------------------
    f["news_article"] = f"""<!DOCTYPE html><html><head><title>City Council Approves Budget — Daily Gazette</title></head>
<body><header><nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>
<li><a href="/sport">Sport</a></li><li><a href="/weather">Weather</a></li></ul></nav></header>
<div class="breadcrumb"><a href="/">Home</a> &gt; <a href="/news">News</a> &gt; Local</div>
<article><h1>City Council Approves Budget</h1>
<p>{_prose(rng, 40)}</p>
<h2>What changes for residents</h2>
<p>{_prose(rng, 35)}</p>
<p>{_prose(rng, 28)}</p></article>
<aside><h3>Related</h3><ul><li><a href="/a">Tax rises explained</a></li><li><a href="/b">Council in numbers</a></li></ul></aside>
<footer><p>© 2026 Daily Gazette. <a href="/privacy">Privacy</a> <a href="/terms">Terms</a></p></footer>
<div class="cookie-banner">We use cookies. <a href="/cookies">Cookie settings</a> <a href="#">Accept all</a></div>
</body></html>""".encode()

    deep_nav = "<div>" * 8 + "<nav><ul>" + "".join(
        f"<li><a href='/s{i}'>Section {i}</a></li>" for i in range(12)
    ) + "</ul></nav>" + "</div>" * 8
    f["nested_nav_footer"] = (
        "<html><body>"
        + deep_nav
        + f"<main><p>{_prose(rng, 32)}</p></main>"
        + "<footer><div><div><ul>"
        + "".join(f"<li><a href='/f{i}'>Footer link {i}</a></li>" for i in range(10))
        + "</ul></div></div></footer></body></html>"
    ).encode()

    f["cookie_linkfarm"] = (
        "<html><body><div>"
        + _nav_links([f"Tag {i}" for i in range(25)])
        + f"</div><p>{_prose(rng, 26)}</p></body></html>"
    ).encode()

    f["ecommerce_product"] = f"""<html><head><title>UltraWidget 3000 | ShopFast</title></head><body>
<nav><a href="/">ShopFast</a> <a href="/cart">Cart (0)</a> <a href="/account">Account</a></nav>
<div class="breadcrumb"><a href="/">Home</a> / <a href="/widgets">Widgets</a> / UltraWidget 3000</div>
<h1>UltraWidget 3000</h1>
<div class="price">$49.99</div>
<form action="/add"><button>Add to cart</button></form>
<h2>Description</h2>
<p>{_prose(rng, 45)}</p>
<h2>Reviews</h2>
<div class="review"><p>{_prose(rng, 22)}</p></div>
<div class="review"><p>{_prose(rng, 18)}</p></div>
<div class="also-bought">{_nav_links(["Widget Mini", "Widget Max", "Widget Pro", "Gadget Plus"])}</div>
</body></html>""".encode()

    f["forum_thread"] = f"""<html><head><title>Why does my build fail? - DevTalk</title></head><body>
<header><nav>{_nav_links(["Forums", "Search", "Log in", "Register"])}</nav></header>
<h1>Why does my build fail?</h1>
<div class="post"><div class="author"><a href="/u/alice">alice</a></div><p>{_prose(rng, 30)}</p></div>
<div class="post"><div class="author"><a href="/u/bob">bob</a></div>
<blockquote>{_prose(rng, 12)}</blockquote><p>{_prose(rng, 33)}</p>
<div class="sig">-- <a href="/u/bob">bob</a>, powered by coffee</div></div>
<footer>{_nav_links(["RSS", "Contact", "Rules"])}</footer></body></html>""".encode()

    # ---- scripts / templates ------------------------------------------
    f["inline_js_template"] = f"""<html><head><title>Dashboard</title>
<script type="text/template"><div class="card"><h2>{{{{title}}}}</h2><p>{{{{body}}}}</p></div></script>
<script type="application/ld+json">{{"@type":"Article","headline":"Not the real title","articleBody":"Fake body that must not leak."}}</script>
<script>var html = "<p>string prose inside js should never appear</p>";</script>
</head><body><h1>Dashboard</h1><p>{_prose(rng, 30)}</p></body></html>""".encode()

    f["style_noscript"] = f"""<html><head><title>Styled</title>
<style>p {{ color: red; }} .x::before {{ content: "<span>css prose</span>"; }}</style></head>
<body><noscript><p>Please enable JavaScript to view this page properly.</p></noscript>
<p>{_prose(rng, 28)}</p></body></html>""".encode()

    # ---- encodings -----------------------------------------------------
    # mostly-valid UTF-8 with a few stray latin-1 bytes (<1% damage):
    # the decode sniffer must stay on UTF-8-with-replacement, keeping
    # the é of the title intact and replacing only the stray bytes
    ok_part = f"<html><head><title>Café review</title></head><body><p>{_prose(rng, 80)} "
    f["broken_utf8"] = ok_part.encode() + b"caf\xe9 cr\xe8me br\xfbl\xe9e" + f" and the review continues. {_prose(rng, 40)}</p></body></html>".encode()

    f["meta_charset_cp1252"] = (
        '<html><head><meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
        "<title>Smart quotes</title></head><body><p>".encode("cp1252")
        + b"\x93Quoted speech\x94 with an em\x97dash and a caf\xe9 visit that "
        b"the whole of the family can agree on for the weekend.</p></body></html>"
    )

    ru = (
        "Обработка русскоязычных страниц из веб-архива требует корректного "
        "определения кодировки, потому что многие старые сайты всё ещё "
        "отдают текст в однобайтовых кодировках без явного заголовка."
    )
    f["cp1251_russian"] = (
        '<html><head><meta charset="windows-1251"><title>Кодировки</title></head>'
        f"<body><p>{ru}</p><nav><a href='/'>Главная</a></nav></body></html>"
    ).encode("cp1251")

    f["latin1_page"] = (
        "<html><head><title>Über die Bäckerei</title></head><body>"
        f"<p>Die Bäckerei öffnet täglich früh. {_prose(rng, 22)}</p></body></html>"
    ).encode("latin-1")

    f["bom_page"] = b"\xef\xbb\xbf" + (
        f"<html><head><title>BOM page</title></head><body><p>{_prose(rng, 25)}</p></body></html>"
    ).encode()

    # ---- RTL / bidi ----------------------------------------------------
    ar_p1 = "تعد معالجة النصوص العربية تحديا حقيقيا لأن الاتجاه من اليمين إلى اليسار يغير طريقة العرض والتقسيم في المتصفحات الحديثة."
    ar_p2 = "في هذه المقالة نناقش كيفية استخراج المحتوى الرئيسي من صفحات الويب العربية مع الحفاظ على الترتيب الصحيح للكلمات والجمل."
    f["rtl_arabic"] = f"""<html dir="rtl" lang="ar"><head><title>استخراج المحتوى العربي</title></head><body>
<nav><a href="/">الرئيسية</a> <a href="/news">الأخبار</a></nav>
<h1>استخراج المحتوى العربي</h1><p>{ar_p1}</p><p>{ar_p2}</p>
<footer><a href="/about">من نحن</a></footer></body></html>""".encode()

    he = "עיבוד טקסט בעברית דורש טיפול נכון בכיווניות הכתיבה מימין לשמאל ובסימני הפיסוק המעורבים בתוך המשפטים."
    f["rtl_hebrew_mixed"] = f"""<html><head><title>Mixed direction page</title></head><body>
<p>{he} The parser must keep this English sentence attached to the same block. ‏‎Marks included.</p>
</body></html>""".encode()

    # ---- tag soup ------------------------------------------------------
    f["unclosed_li_soup"] = (
        "<html><body><ul>"
        + "".join(f"<li><a href='/x{i}'>Item {i}</a>" for i in range(10))
        + f"<li>{_prose(rng, 26)}"
        + f"</ul><p>{_prose(rng, 20)}</p></body></html>"
    ).encode()

    f["unclosed_p_chain"] = (
        "<html><body>"
        + "".join(f"<p>{_prose(rng, 18)}" for _ in range(4))
        + "</body></html>"
    ).encode()

    f["option_soup"] = f"""<html><body><form><select>
<option>United States<option>Canada<option>Mexico<option selected>Other
</select></form><p>{_prose(rng, 24)}</p></body></html>""".encode()

    f["title_implicit_close"] = (
        f"<html><head><title>Implicit title</head><body><p>{_prose(rng, 27)}</p></body></html>"
    ).encode()

    f["no_title_h1_fallback"] = (
        f"<html><body><h1>Fallback Heading Title</h1><p>{_prose(rng, 24)}</p></body></html>"
    ).encode()

    f["stray_end_tags"] = (
        f"</div></p></span><html><body><p>{_prose(rng, 23)}</p></b></i></body></html>"
    ).encode()

    f["nested_anchor"] = (
        "<html><body><p><a href='/a'>first link <a href='/b'>second link</a></p>"
        + f"<p>{_prose(rng, 25)}</p></body></html>"
    ).encode()

    f["uppercase_tags"] = (
        f"<HTML><BODY><NAV><A HREF='/'>HOME</A></NAV><P>{_prose(rng, 24)}</P></BODY></HTML>"
    ).encode()

    f["deep_div_nesting"] = (
        "<html><body>" + "<div>" * 60 + f"<p>{_prose(rng, 28)}</p>" + "</div>" * 60 + "</body></html>"
    ).encode()

    # ---- damage --------------------------------------------------------
    base_page = f"<html><head><title>Truncated page</title></head><body><p>{_prose(rng, 30)}</p><p>{_prose(rng, 30)}</p><di"
    f["truncated_mid_tag"] = base_page.encode()

    splice = bytes(rng.getrandbits(8) for _ in range(64))
    f["binary_splice"] = (
        f"<html><head><title>Spliced</title></head><body><p>{_prose(rng, 22)}</p>".encode()
        + splice
        + f"<p>{_prose(rng, 22)}</p></body></html>".encode()
    )

    f["empty_doc"] = b""
    f["whitespace_only"] = b"   \n\t  \n "

    # ---- structure variety --------------------------------------------
    f["table_layout"] = f"""<html><body><table><tr>
<td class="sidebar">{_nav_links(["Home", "About", "Products", "Blog", "Contact"])}</td>
<td class="content"><h1>Table layout era</h1><p>{_prose(rng, 34)}</p></td>
</tr></table></body></html>""".encode()

    f["data_table"] = f"""<html><body><h1>Quarterly numbers</h1>
<table><tr><th>Q</th><th>Revenue</th></tr><tr><td>Q1</td><td>1.2</td></tr>
<tr><td>Q2</td><td>1.4</td></tr><tr><td>Q3</td><td>1.1</td></tr></table>
<p>{_prose(rng, 26)}</p></body></html>""".encode()

    f["pre_code"] = f"""<html><body><h2>Example</h2>
<pre>def add(a, b):
    return a + b  # the sum of the two arguments is returned to the caller</pre>
<p>{_prose(rng, 24)}</p></body></html>""".encode()

    f["figure_captions"] = f"""<html><body><p>{_prose(rng, 24)}</p>
<figure><img src="x.png"><figcaption>Fig 1</figcaption></figure>
<figure><img src="y.png"><figcaption>Figure 2 shows the complete pipeline with all of the stages that run on the cluster in production.</figcaption></figure>
</body></html>""".encode()

    f["blockquote_prose"] = f"""<html><body><p>{_prose(rng, 20)}</p>
<blockquote>{_prose(rng, 28)}</blockquote></body></html>""".encode()

    f["svg_template_subtrees"] = f"""<html><body>
<svg viewBox="0 0 10 10"><text x="1" y="1">svg label text must not leak</text></svg>
<template><div><p>template card prose must not leak</p></div></template>
<p>{_prose(rng, 26)}</p></body></html>""".encode()

    f["angle_in_attr"] = (
        '<html><body><div title="a > b" data-tpl="<span>not content</span>">'
        + f"{_prose(rng, 25)}</div></body></html>"
    ).encode()

    f["entities"] = """<html><head><title>Q&amp;A &#8212; tips &amp; tricks</title></head><body>
<p>Ben &amp; Jerry said 2 &lt; 3 and that it is &#8220;obviously&#8221; the case for all of the numbers we know. &#x263A;</p>
</body></html>""".encode()

    f["comments_conditional"] = f"""<html><body><!--[if IE]><p>Upgrade your browser</p><![endif]-->
<!-- <p>commented out prose should not appear</p> -->
<p>{_prose(rng, 27)}</p></body></html>""".encode()

    f["meta_refresh"] = f"""<html><head><meta http-equiv="refresh" content="0;url=/new">
<title>Moved</title></head><body><p>This page has moved to a new address but we still include enough prose for the extractor to keep the paragraph.</p></body></html>""".encode()

    f["duplicate_h1"] = f"""<html><head><title>The Real Title</title></head><body>
<h1>First Heading</h1><p>{_prose(rng, 22)}</p><h1>Second Heading</h1><p>{_prose(rng, 22)}</p>
</body></html>""".encode()

    f["heading_ladder"] = f"""<html><body><h1>Top</h1><p>{_prose(rng, 16)}</p>
<h2>Second</h2><p>{_prose(rng, 16)}</p><h3>Third</h3><p>{_prose(rng, 16)}</p>
<h4>Fourth</h4><h5>Fifth</h5><h6>Sixth</h6><p>{_prose(rng, 16)}</p></body></html>""".encode()

    # ---- space-free scripts -------------------------------------------
    zh = "这是一段相当长的中文正文内容，讨论了大规模数据处理管道的设计与实现，并给出了若干在生产环境中得到验证的实际例子。"
    f["cjk_article"] = f"""<html><head><title>中文主要内容提取</title></head><body>
<nav><a href="/">首页</a> <a href="/news">新闻</a> <a href="/tech">科技</a></nav>
<h1>中文主要内容提取</h1><p>{zh}</p><p>{zh[:40]}</p>
<footer><a href="/about">关于我们</a></footer></body></html>""".encode()

    ja = "日本語のウェブページから本文を抽出するには、単語の区切りが空白ではないため、文字数に基づく判定が必要になります。"
    f["japanese_mixed"] = f"""<html><head><title>日本語ページ</title></head><body>
<p>{ja}</p><p>短い。</p><p>Short English line.</p></body></html>""".encode()

    ko = "한국어 웹 문서에서 본문을 추출할 때에는 조사와 어미 변화가 많아서 불용어 목록보다 글자 수 기반의 기준이 더 안정적으로 동작합니다."
    f["korean_prose"] = f"""<html><head><title>한국어 페이지</title></head><body>
<p>{ko}</p><nav><a href="/">홈</a> <a href="/a">메뉴</a></nav></body></html>""".encode()

    th = "การประมวลผลข้อความภาษาไทยมีความท้าทายเพราะไม่มีการเว้นวรรคระหว่างคำ จึงต้องใช้เกณฑ์จำนวนตัวอักษรแทนการนับคำ"
    f["thai_prose"] = f"""<html><head><title>หน้าภาษาไทย</title></head><body><p>{th}</p></body></html>""".encode()

    f["cjk_linkfarm"] = (
        "<html><body><div>"
        + "".join(f"<a href='/c{i}'>分类{i}目录页面</a> " for i in range(15))
        + f"</div><p>{zh}</p></body></html>"
    ).encode()

    # bilingual block: a short CJK run mixed with enough Latin prose —
    # the CJK char-count gate must fall through to the word gates, not
    # veto (review finding: `return nospace >= 20` dropped these)
    f["bilingual_short_cjk"] = (
        "<html><head><title>Bilingual</title></head><body>"
        "<p>こんにちは世界のニュースです and the rest of this sentence is "
        "ordinary English prose that must be kept.</p></body></html>"
    ).encode()

    # declared charset lies: bytes are cp1252 but the page claims utf-8
    # (common misconfiguration) — the sniffer must ignore the lying
    # declaration (strict utf-8 already failed) and fall through to the
    # damage heuristic instead of mojibaking the whole page
    f["declared_utf8_lie"] = (
        '<html><head><meta charset="utf-8"><title>Declared lie</title></head>'
        "<body><p>The caf\xe9 on the corner serves cr\xe8me br\xfbl\xe9e and "
        "the regulars agree that it is worth the wait on a busy morning."
        "</p></body></html>"
    ).encode("cp1252")

    # ---- semantics tags -------------------------------------------------
    f["main_article_semantics"] = f"""<html><head><title>Semantic page</title></head><body>
<header><h1>Site Banner Brand</h1><nav>{_nav_links(["One", "Two"])}</nav></header>
<main><article><h1>Actual Article Heading</h1><p>{_prose(rng, 30)}</p></article></main>
<footer><p>Short footer.</p></footer></body></html>""".encode()

    f["br_segmentation"] = f"""<html><body><div>{_prose(rng, 14)}<br>{_prose(rng, 14)}<br><a href='/x'>tiny</a></div></body></html>""".encode()

    f["form_heavy"] = f"""<html><head><title>Sign up</title></head><body>
<form action="/signup"><label>Email</label><input type="email"><label>Password</label>
<input type="password"><button>Create account</button>
<p>By signing up you agree to the terms of service and privacy policy text inside the form.</p></form>
<p>{_prose(rng, 24)}</p></body></html>""".encode()

    return f


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="rewrite fixtures AND expected.json")
    args = ap.parse_args()

    from pdf_extractor_spark.operators.html_extract import extract_html

    fixtures = build_fixtures()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    expected_path = OUT_DIR / "expected.json"
    if expected_path.exists() and not args.update:
        print(f"{expected_path} exists; rerun with --update to regenerate", file=sys.stderr)
        return 1

    expected: dict[str, dict] = {}
    for name, payload in sorted(fixtures.items()):
        (OUT_DIR / f"{name}.html").write_bytes(payload)
        expected[name] = extract_html(payload)
    expected_path.write_text(
        json.dumps(expected, indent=1, ensure_ascii=False, sort_keys=True),
        encoding="utf-8",
    )
    print(f"wrote {len(fixtures)} fixtures + expected.json to {OUT_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
