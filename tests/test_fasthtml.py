"""Fast-tokenizer equivalence: byte-identical blocks vs the stdlib parser."""

from hypothesis import given, settings, strategies as st

from webextract.corpus import make_corpus
from webextract.extract import decode_html, extract_document
from webextract.fasthtml import parse_blocks_fast
from webextract.heuristics import CLASS_BLOCKLIST
from webextract.htmlblocks import parse_blocks


def _blocks_sig(blocks):
    return [(b.kind, b.tag, b.raw_text, b.link_chars, b.total_chars,
             b.own_class, b.boiler_ancestor) for b in blocks]


def test_equivalence_on_full_corpus():
    pages, _ = make_corpus(800, seed=42)
    checked = 0
    for p in pages:
        raw = p["html"]
        if not raw or raw[:5] == b"%PDF-":
            continue
        try:
            html = decode_html(raw)
        except Exception:
            continue
        slow = _blocks_sig(parse_blocks(html, CLASS_BLOCKLIST))
        fast = _blocks_sig(parse_blocks_fast(html, CLASS_BLOCKLIST))
        assert fast == slow, p["url"]
        checked += 1
    assert checked > 700


def test_equivalence_heavy_pages():
    pages, _ = make_corpus(60, seed=9, content_scale=10)
    for p in pages:
        raw = p["html"]
        if not raw or raw[:5] == b"%PDF-":
            continue
        try:
            html = decode_html(raw)
        except Exception:
            continue
        assert _blocks_sig(parse_blocks_fast(html, CLASS_BLOCKLIST)) == \
            _blocks_sig(parse_blocks(html, CLASS_BLOCKLIST))


# hypothesis grammar over benign HTML (the engine's specified input class)
_word = st.text(alphabet="abcdefg &<", min_size=0, max_size=12)
_cls = st.sampled_from(["", "sidebar", "content", "menu x", "a_b-c"])


@st.composite
def _element(draw, depth=0):
    tag = draw(st.sampled_from(
        ["p", "div", "h1", "blockquote", "li", "nav", "footer", "span",
         "article", "ul", "td", "pre"]))
    cls = draw(_cls)
    attrs = f' class="{cls}"' if cls else ""
    if depth < 2 and draw(st.booleans()):
        inner = "".join(draw(st.lists(_element(depth=depth + 1), max_size=3)))
    else:
        inner = draw(_word).replace("<", "&lt;")
    link = draw(st.booleans())
    if link:
        inner = f'<a href="/x">{inner}</a>'
    return f"<{tag}{attrs}>{inner}</{tag}>"


@settings(max_examples=200, deadline=None)
@given(st.lists(_element(), max_size=6), _word)
def test_equivalence_on_generated_html(elements, tail):
    html = ("<html><head><title>t</title><script>var a = '<p>';</script></head>"
            "<body>" + "".join(elements) + tail.replace("<", "&lt;")
            + "</body></html>")
    assert _blocks_sig(parse_blocks_fast(html, CLASS_BLOCKLIST)) == \
        _blocks_sig(parse_blocks(html, CLASS_BLOCKLIST))


def test_fallback_on_pathological_markup():
    # unterminated tag: fast path must fall back, not diverge
    html = "<html><body><p>text here</p><div <broken"
    fast = parse_blocks_fast(html, CLASS_BLOCKLIST)
    slow = parse_blocks(html, CLASS_BLOCKLIST)
    assert _blocks_sig(fast) == _blocks_sig(slow)


def test_extract_document_unchanged():
    """extract_document output stays byte-identical after wiring the fast path."""
    pages, truth = make_corpus(400, seed=42)
    tmap = {t["url"]: t for t in truth}
    for p in pages:
        t = tmap[p["url"]]
        r = extract_document(p["html"])
        if t["expected_text"] is None:
            assert r.status != "ok"
        else:
            assert r.text == t["expected_text"]


def test_comment_close_matches_stdlib():
    """ADVICE round 1: the fast comment regex must end comments exactly where
    stdlib's _commentclose (--\\s*>) does, incl. whitespace closes and --!>
    non-closes; unterminated comments fall back rather than guess."""
    cases = [
        "<p><!--a-- >b--></p>",       # stdlib closes at '-- >' → 'b-->' is text
        "<p><!--a--!>b--></p>",       # '--!>' does NOT close; swallows b
        "<p><!-- c --  > tail</p>",   # whitespace between -- and >
        "<p>a<!--x--!-->b</p>",
        "<p><!---></p><p>t</p>",
        "<p><!----></p><p>t</p>",
        "<p><!--a--x-->b</p>",
        "<p><!--unterminated and <b>more</b></p>",  # fallback path
        "<p><!-->x</p>",
    ]
    for html in cases:
        assert _blocks_sig(parse_blocks_fast(html, CLASS_BLOCKLIST)) == \
            _blocks_sig(parse_blocks(html, CLASS_BLOCKLIST)), html


def test_rawtext_comment_spanning_close_matches_stdlib():
    """r5c finditer scan: a comment OPENING inside a raw-text body and
    closing after the close tag is consumed by the comment match, hiding
    the tags in between — the documented contract widening routes such
    documents to the stdlib fallback. Both parsers treat raw text as
    running to the FIRST close tag, so output stays identical either way."""
    cases = [
        # comment swallows </script> and a following <p>
        "<div><script>x <!-- </script><p>hi --> ok</p><p>tail</p></div>",
        # same shape for <style>
        "<p>a</p><style>s <!-- </style><p>b --> c</p>",
        # benign raw-text comment fully inside the body (stays on fast path)
        "<p>a</p><script>x <!-- y --> z</script><p>b</p>",
        # close tag inside the comment is still the raw-text terminator
        "<script><!-- </script> --><p>q</p>",
    ]
    for html in cases:
        fast = parse_blocks_fast(html, CLASS_BLOCKLIST)
        slow = parse_blocks(html, CLASS_BLOCKLIST)
        assert _blocks_sig(fast) == _blocks_sig(slow), html


def test_rawtext_close_is_stdlib_exact():
    """r5c review findings: the raw-text close must be the stdlib's OWN
    pattern (set_cdata_mode's `</\\s*tag\\s*>`): near-miss closes like
    </script/> or </script foo> do NOT end the element (stdlib scans past
    them as suppressed data), while </ script> and </script > DO. Marked
    sections (<![CDATA[..]]>, <![if..]>) take the stdlib fallback — their
    ]]>-scanned bodies may contain '>'."""
    cases = [
        "<b><p> <script></script/>y--</script\t>",
        "<p>a<script>x</script/>hidden</script>b</p>",
        "<p>a<script>x</script foo>hidden</script>b</p>",
        "<p>a<script>x</ script>b</p>",
        "<p>a<script>x</ SCRIPT >b</p>",
        "<p>a<script>x</scriptx></script>b</p>",
        "<p>a<style>s</style/>h</style>b</p>",
        "<p>a<script>x</script >b</p>",
        "<li><![CDATA[y -->",
        "<p>a<![CDATA[x]]>b</p>",
        "<p>a<![CDATA[x > y]]>b</p>",
        "<p>a<![if !IE]>x<![endif]>b</p>",
    ]
    for html in cases:
        fast = parse_blocks_fast(html, CLASS_BLOCKLIST)
        slow = parse_blocks(html, CLASS_BLOCKLIST)
        assert _blocks_sig(fast) == _blocks_sig(slow), html
