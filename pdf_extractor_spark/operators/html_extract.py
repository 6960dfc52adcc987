"""HTML main-content extraction (north-rule addition, SURVEY.md §2.11).

The reference contains no HTML code; the north rule adds "HTML
boilerplate strip … DOM heuristics". This is a public-knowledge
jusText/Boilerpipe-style extractor built on stdlib ``html.parser``
only (no lxml/bs4 in the environment):

  1. stream the DOM, dropping ``script/style/nav/header/footer/aside/
     form/noscript/iframe/svg/template/button/select`` subtrees;
  2. segment text into blocks at block-level tag boundaries;
  3. per block compute link density (chars inside <a> / total chars),
     stopword density and length;
  4. keep blocks that look like prose (long enough, low link density,
     some stopwords) — classic boilerplate heuristics;
  5. emit headings from <h1>..<h6> as outline entries (level = tag),
     plus the <title> / first <h1> as the document title.

Deterministic and pure → golden-file + idempotence tested.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

_DROP_TAGS = frozenset(
    "script style nav header footer aside form noscript iframe svg template button select option".split()
)
_BLOCK_TAGS = frozenset(
    "p div section article main li ul ol table tr td th h1 h2 h3 h4 h5 h6 blockquote pre br hr figure figcaption".split()
)
_HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

# small multilingual stopword seed (public knowledge: the top function
# words of each language); enough for a prose-vs-boilerplate density
# signal.  Space-delimited non-Latin scripts (Arabic, Hebrew, Cyrillic,
# Greek, Devanagari) need their own entries — English stopwords never
# fire on them and the 120-char long-form gate under-covers their
# shorter byte-dense paragraphs.
_STOPWORDS = frozenset(
    "the a an and or of to in is are was for on with as at by it this that "
    "le la les de et un une du des en est "
    "der die das und ein eine von zu im den "
    "el la los las de y un una del en es "
    "o os as do da em um uma para com não por que e "  # pt
    "il lo di in un per con non che si "  # it
    "het een van op voor met niet dat "  # nl
    "och att det som på är av om "  # sv
    "og i på det til af er han "  # da/no
    "i w nie na się z że jest "  # pl
    "ve bir bu için ile daha çok "  # tr
    "yang dan di ke dari untuk dengan pada adalah "  # id/ms
    "và của là có trong cho không được "  # vi
    "في من على إلى عن أن مع هذا هذه التي الذي كان لا ما "  # ar
    "של את על עם זה הוא היא גם כי לא אם אבל "  # he
    "и в не на я с что это как по но из у за от так "  # ru
    "και το να του η με για από τα που "  # el
    "के की का में है और से पर यह भी "  # hi
    .split()
)

# punctuation stripped before the stopword lookup — includes Arabic
# comma/semicolon/question mark, guillemets, CJK-adjacent dashes
_STRIP_CHARS = ".,;:!?\"'()«»،؛؟—–…"

_WS_RX = re.compile(r"\s+")

# space-free scripts (CJK ideographs, kana, Hangul, Thai): word-count
# heuristics read a whole paragraph as "1 word", so prose gates switch
# to character counts for blocks dominated by these ranges
_NOSPACE_SCRIPT_RX = re.compile(
    "[\u0e00-\u0e7f"  # Thai
    "\u3040-\u30ff"  # Hiragana + Katakana
    "\u3400-\u9fff"  # CJK ideographs (ext A + unified)
    "\uac00-\ud7af"  # Hangul syllables
    "\uf900-\ufaff]"  # CJK compatibility ideographs
)

# HTML5 void elements: they emit no end tag, so they must never enter
# the open-element stack (an <hr> that "never closes" is not unclosed)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr keygen".split()
)

# tags whose end tag is optional and is implied by a sibling start tag
# (the crawled-HTML cases that leaked depth forever: '<option>USA'
# '<option>Canada' without </option>, consecutive <li>, nested <a> —
# the spec implies closing the previous one)
_IMPLIED_SIBLING_CLOSE = frozenset("option li p tr td th a".split())


class _Extractor(HTMLParser):
    """Streaming extractor with a simplified open-element stack.

    Dirty crawled HTML leaves tags unclosed; tracking drop/link state
    as bare counters leaked depth forever and silently discarded the
    rest of the document (review finding). Instead: every non-void
    start tag pushes onto a stack; an end tag pops up to and including
    its nearest match (implicitly closing unclosed children, exactly
    what browser tree builders do); drop/link depth are derived counts
    maintained against that stack, so they can never leak past the
    enclosing element's close."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._stack: list[str] = []
        self._drop_depth = 0
        self._link_depth = 0
        self._heading: Optional[str] = None
        self._parts: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self.title_parts: list[str] = []
        self._in_title = False

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        """CPython wart: on crawled-web `<![` declarations, _markupbase
        raises AssertionError (garbage after `<![`) or NotImplementedError
        (unknown section keyword, e.g. `<![if !IE]>` variants it doesn't
        know). A boilerplate extractor must not fail the whole page for
        one bad declaration — treat it as a bogus comment: skip to the
        next `>` and keep extracting the rest of the document."""
        try:
            return super().parse_marked_section(i, report)
        except (AssertionError, NotImplementedError, ValueError):
            close = self.rawdata.find(">", i + 3)
            return -1 if close < 0 else close + 1

    # -- open-element stack ----------------------------------------------
    def _push(self, tag: str) -> None:
        if tag in _IMPLIED_SIBLING_CLOSE and self._stack and self._stack[-1] == tag:
            self._pop_one()
        self._stack.append(tag)
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        if tag == "a":
            self._link_depth += 1

    def _pop_one(self) -> None:
        tag = self._stack.pop()
        if tag in _DROP_TAGS:
            self._drop_depth -= 1
        if tag == "a":
            self._link_depth -= 1
        if tag == "title":
            # <title> implicitly closed (e.g. "<title>Foo</head>") must
            # stop capturing, or the whole body lands in title_parts
            self._in_title = False

    def _pop_until(self, tag: str) -> bool:
        """Pop up to and including the nearest open ``tag``; a stray end
        tag with no matching open element pops nothing."""
        if tag not in self._stack:
            return False
        while self._stack:
            top = self._stack[-1]
            self._pop_one()
            if top == tag:
                break
        return True

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        text = _WS_RX.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "tag": self._heading or "p",
                    "link_chars": self._link_chars,
                    "total_chars": self._total_chars,
                }
            )
        self._parts = []
        self._link_chars = 0
        self._total_chars = 0

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            if tag in ("br", "hr") and not self._drop_depth:
                self._flush()
            return
        was_dropping = bool(self._drop_depth)
        self._push(tag)
        if was_dropping:
            return
        if tag in _DROP_TAGS:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._heading = tag if tag in _HEADING_TAGS else None

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if not self._pop_until(tag):
            return  # stray end tag: no matching open element
        if tag in _DROP_TAGS or self._drop_depth:
            return  # closed a drop element, or still inside one
        if tag == "title":
            self._in_title = False
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADING_TAGS:
                self._heading = None

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        self._parts.append(data)
        n = len(data.strip())
        self._total_chars += n
        if self._link_depth:
            self._link_chars += n


def _is_content(block: dict) -> bool:
    """Boilerplate vs content decision for non-heading blocks."""
    text = block["text"]
    total = max(block["total_chars"], 1)
    link_density = block["link_chars"] / total
    if link_density > 0.5:
        return False
    nospace = len(_NOSPACE_SCRIPT_RX.findall(text))
    if nospace >= 20:
        # CJK/Thai prose: one char carries ~2-3x a Latin char's
        # information and stopword lists don't transfer, so the gate
        # is a character count (jusText/trafilatura use language-aware
        # thresholds the same way). Short space-free runs fall THROUGH
        # to the word gates rather than vetoing: a bilingual block
        # ("こんにちは… and more is here") keeps its Latin-prose
        # verdict, while pure-CJK nav items ("首页") still fail the
        # ≥4-words gate below.
        return True
    words = text.split()
    if len(words) < 4:
        return False
    stop = sum(1 for w in words if w.lower().strip(_STRIP_CHARS) in _STOPWORDS)
    stop_density = stop / len(words)
    # prose either has stopwords or is long-form text
    return stop_density >= 0.05 or len(text) >= 120


_CHARSET_RX = re.compile(rb"charset\s*=\s*[\"']?\s*([a-zA-Z0-9_:.-]+)", re.I)


def _decode(payload: bytes) -> str:
    """WHATWG-style best-effort decode for crawled pages:

    1. UTF-8 BOM wins;
    2. strict UTF-8 if it round-trips (the common case — never
       penalized by sniffing);
    3. a ``charset=`` declaration in the first 4 KiB (meta tag or
       http-equiv; latin-1/iso-8859-1 is aliased to windows-1252 per
       the WHATWG encoding standard);
    4. else UTF-8-with-replacement when the damage is sparse
       (<1% replacement chars: a UTF-8 page with stray bytes), else
       windows-1252 (the web's de-facto legacy fallback, total —
       every byte decodes).
    """
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", errors="replace")
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _CHARSET_RX.search(payload[:4096])
    if m:
        name = m.group(1).decode("ascii", "replace").strip().lower()
        if name in ("latin-1", "latin1", "iso-8859-1", "iso8859-1", "us-ascii"):
            name = "cp1252"
        if name not in ("utf-8", "utf8"):
            # a declared utf-8 is a lie here (strict utf-8 already
            # failed) — fall through to the damage heuristic instead
            # of mojibaking the whole page with replacement chars
            try:
                return payload.decode(name, errors="replace")
            except LookupError:
                pass
    text = payload.decode("utf-8", errors="replace")
    if text.count("�") / max(len(text), 1) < 0.01:
        return text
    return payload.decode("cp1252", errors="replace")


def extract_html(payload: bytes) -> dict:
    """payload bytes → {title, main_text, outline, n_kept, n_dropped}."""
    text = _decode(payload)
    parser = _Extractor()
    parser.feed(text)
    parser._flush()

    outline = []
    kept: list[str] = []
    dropped = 0
    for b in parser.blocks:
        if b["tag"] in _HEADING_TAGS:
            level = "H" + b["tag"][1]
            outline.append({"level": level, "text": b["text"], "page": 0})
            kept.append(b["text"])
        elif _is_content(b):
            kept.append(b["text"])
        else:
            dropped += 1

    title = _WS_RX.sub(" ", "".join(parser.title_parts)).strip()
    if not title:
        h1s = [e["text"] for e in outline if e["level"] == "H1"]
        title = h1s[0] if h1s else ""
    return {
        "title": title,
        "main_text": "\n".join(kept),
        "outline": outline,
        "n_kept": len(kept),
        "n_dropped": dropped,
    }
