"""Deterministic synthetic Common-Crawl-style corpus with known ground truth.

FIXTURES.md §1: pages are assembled from blocks whose classification is known
at generation time — boilerplate (nav/header/footer/sidebar/ads/cookie/share,
link-dense menus) vs content (h1 title, paragraphs, optional blockquote) —
so ``expected_text`` is produced by construction using the same canonical
normalization spec the extractor implements (:mod:`webextract.textnorm`).
This mirrors the reference's stub-based test strategy (outputs known by
construction, reference ``tests/test_extraction_orchestrator.py:63-129``)
scaled up to a corpus, plus its documented ground-truth evaluation harness
(``docs/guides/implementing-evaluation.md:15-54``).

Everything is seeded; no wall clock, no global RNG. Same (n, seed, skew)
⇒ identical bytes, at any scale, regardless of generation order (the per-row
RNG is keyed on (seed, i)).

Row schedule (by row index i):
- edge cases (~1% each): i%97==3 entities, ==7 nested divs, ==11 latin-1,
  ==13 whitespace torture, ==17 empty-content, ==19 PDF payload;
- planted failures (~0.5% each): i%199==23 truncated mid-multibyte-char,
  ==29 empty bytes, ==31 binary garbage;
- recrawls (~2%): i%50==0 emits a second row, same url, warc_ts +1 day,
  different boilerplate but the SAME content blocks ⇒ identical
  expected_text (dedupe never changes correctness).
"""

from __future__ import annotations

import html as htmlmod
import random
import zlib
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

DOMAINS = [
    "news.example.com", "blog.example.org", "docs.example.net", "shop.example.io",
    "wiki.example.dev", "forum.example.co", "mag.example.site", "press.example.info",
    "daily.example.app", "tech.example.live", "food.example.cafe", "auto.example.garage",
    "home.example.house", "kids.example.school", "art.example.gallery", "sci.example.lab",
    "geo.example.earth", "fin.example.bank", "med.example.clinic", "law.example.firm",
]

WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "
    "incididunt labore dolore magna aliqua enim minim veniam quis nostrud "
    "exercitation ullamco laboris nisi aliquip commodo consequat duis aute irure "
    "reprehenderit voluptate velit esse cillum fugiat nulla pariatur excepteur "
    "sint occaecat cupidatat non proident sunt culpa officia deserunt mollit anim "
    "laborum perspiciatis unde omnis iste natus error voluptatem accusantium "
    "doloremque laudantium totam rem aperiam eaque ipsa quae illo inventore "
    "veritatis quasi architecto beatae vitae dicta explicabo nemo ipsam quia "
    "voluptas aspernatur aut odit fugit consequuntur magni dolores eos ratione "
    "sequi nesciunt neque porro quisquam dolorem adipisci numquam eius modi "
    "tempora incidunt magnam quaerat etiam ornare augue vitae commodo posuere "
    "integer feugiat justo vel lectus hendrerit suscipit curabitur pretium"
).split()

LINKY = ["home", "about", "contact", "login", "register", "archive", "topics",
         "privacy", "terms", "careers", "search", "subscribe", "more"]

ADS_TEXT = ["Buy now and save big today", "Limited offer click here",
            "Best deals of the season", "Sponsored content you may like"]

# whitespace-torture inserts
_WS_CHARS = ["\t", " ", "\n\n", "  ", " \t ", " "]


def _rng(seed: int, i: int, tag: str = "") -> random.Random:
    return random.Random(f"{seed}|{i}|{tag}")


def _sentence(r: random.Random, nmin: int = 5, nmax: int = 13) -> str:
    n = r.randint(nmin, nmax)
    ws = [r.choice(WORDS) for _ in range(n)]
    return ws[0].capitalize() + " " + " ".join(ws[1:]) + "."


def _title_text(r: random.Random) -> str:
    ws = [r.choice(WORDS) for _ in range(r.randint(3, 7))]
    return " ".join(w.capitalize() for w in ws)


def _paragraph_text(r: random.Random) -> str:
    return " ".join(_sentence(r) for _ in range(r.randint(2, 5)))


def _nav_html(r: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>'
        for w in r.sample(LINKY, r.randint(5, min(12, len(LINKY))))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _boiler_div(r: random.Random) -> str:
    cls = r.choice(["sidebar", "ads", "cookie-banner", "share-buttons"])
    if cls in ("sidebar", "share-buttons"):
        links = " ".join(f'<a href="/{w}">{w}</a>' for w in r.sample(LINKY, 5))
        return f'<div class="{cls}">{links}</div>'
    return f'<div class="{cls}"><p>{r.choice(ADS_TEXT)}</p></div>'


def _footer_html(r: random.Random, domain: str) -> str:
    links = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in r.sample(LINKY, 4))
    return (f"<footer><p>© 2025 {domain}. All rights reserved.</p>"
            f"<ul>{links}</ul></footer>")


def _linkify(r: random.Random, para: str) -> str:
    """Wrap one middle word in an <a>; keeps link density well under 0.5."""
    words = para.split(" ")
    if len(words) < 8:
        return para
    k = r.randint(2, len(words) - 2)
    words[k] = f'<a href="/ref">{words[k]}</a>'
    return " ".join(words)


def _norm_ws_basic(s: str) -> str:
    # local import to keep generator/extractor sharing explicit & minimal:
    from .textnorm import normalize_ws
    return normalize_ws(s)


def _content_blocks(r: random.Random, case: str,
                    content_scale: int = 1) -> list[tuple[str, str, str]]:
    """Return [(kind, html_fragment, expected_text)], document order."""
    blocks: list[tuple[str, str, str]] = []
    title = _title_text(r)
    blocks.append(("title", f"<h1>{htmlmod.escape(title)}</h1>", title))
    for _ in range(r.randint(2, 8) * content_scale):
        raw = _paragraph_text(r)
        if case == "entities":
            raw = raw.replace(" ", " & ", 1).replace(".", "’s.", 1)
            frag = htmlmod.escape(raw).replace("’", "&#8217;")
        elif case == "whitespace":
            ws = r.choice(_WS_CHARS)
            frag = htmlmod.escape(raw).replace(" ", ws, 3)
        else:
            frag = htmlmod.escape(raw)
            if r.random() < 0.3:
                frag = _linkify(r, frag)
        expected = _norm_ws_basic(raw)
        blocks.append(("paragraph", f"<p>{frag}</p>", expected))
    if r.random() < 0.3:
        q = _sentence(r) + " " + _sentence(r)
        blocks.append(("quote", f"<blockquote>{htmlmod.escape(q)}</blockquote>", q))
    return blocks


def _assemble_page(r: random.Random, domain: str, case: str,
                   content: list[tuple[str, str, str]], charset: str = "utf-8",
                   boiler_seed_tag: str = "") -> str:
    rb = random.Random(f"{r.random()}|{boiler_seed_tag}") if boiler_seed_tag else r
    head = (f'<head><meta charset="{charset}"><title>Site {domain}</title>'
            f"<style>body{{margin:0}}</style>"
            f"<script>var x = 1 < 2;</script></head>")
    nav = _nav_html(rb)
    header = f'<header><div class="logo">{domain}</div>{nav}</header>'
    boilers = [_boiler_div(rb) for _ in range(rb.randint(1, 3))]
    body_content = "".join(frag for (_k, frag, _e) in content)
    if case == "nested":
        for _ in range(10):
            body_content = f"<div>{body_content}</div>"
    wrapper = rb.random() < 0.5
    if wrapper:
        body_content = f"<article>{body_content}</article>"
    else:
        body_content = f'<div class="content-main">{body_content}</div>'
    footer = _footer_html(rb, domain)
    comment = "<!-- generated page; boilerplate varies by crawl -->"
    return ("<!DOCTYPE html><html>" + head + "<body>" + comment + header
            + boilers[0] + body_content + "".join(boilers[1:]) + footer
            + "</body></html>")


def make_pdf(paragraphs: list[str], compress: bool = True) -> bytes:
    """A tiny single-page text PDF: one BT…ET block per paragraph."""
    ops = []
    for p in paragraphs:
        esc = p.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1"))
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    parts = [b"%PDF-1.4\n"]
    parts.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    parts.append(b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    parts.append(b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    parts.append(b"4 0 obj << /Length " + str(len(content)).encode() + filt
                 + b" >>\nstream\n" + content + b"endstream\nendobj\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def _case_for(i: int) -> str:
    m199 = i % 199
    if m199 == 23:
        return "fail_truncated"
    if m199 == 29:
        return "fail_empty"
    if m199 == 31:
        return "fail_garbage"
    m97 = i % 97
    return {3: "entities", 7: "nested", 11: "latin1", 13: "whitespace",
            17: "empty_content", 19: "pdf"}.get(m97, "normal")


def _garbage(r: random.Random, n: int = 256) -> bytes:
    # invalid-UTF-8, '<'-free bytes: continuation bytes only
    return bytes(r.choice(range(0x80, 0xC0)) for _ in range(n))


def make_corpus(n: int, seed: int = 42, skew: bool = False,
                content_scale: int = 1):
    """Build the corpus. Returns (pages, truth): lists of dicts.

    pages: url, warc_ts, html(bytes), text, lang      (FIXTURES.md §1)
    truth: url, expected_text, expected_spans, case   (FIXTURES.md §2)
    """
    from .textnorm import join_blocks

    pages: list[dict] = []
    truth: list[dict] = []
    langs = ["en", "es", "de", "fr"]
    for i in range(n):
        r = _rng(seed, i)
        case = _case_for(i)
        if skew:
            domain = DOMAINS[0] if r.random() < 0.8 else r.choice(DOMAINS[1:])
        else:
            domain = DOMAINS[i % len(DOMAINS)]
        url = f"https://{domain}/{r.choice(WORDS)}-{i:06d}"
        ts = EPOCH + timedelta(seconds=17 * i)
        lang = langs[i % 4]

        if case == "fail_empty":
            pages.append(dict(url=url, warc_ts=ts, html=b"", text="", lang=lang))
            truth.append(dict(url=url, expected_text=None, expected_spans=None, case=case))
            continue
        if case == "fail_garbage":
            pages.append(dict(url=url, warc_ts=ts, html=_garbage(r), text="", lang=lang))
            truth.append(dict(url=url, expected_text=None, expected_spans=None, case=case))
            continue

        if case == "pdf":
            paras = [_norm_ws_basic(_paragraph_text(r))
                     for _ in range(r.randint(2, 4) * content_scale)]
            raw = make_pdf(paras, compress=(i % 2 == 0))
            expected, offs = join_blocks(paras)
            spans = [{"start": s, "end": e, "kind": "paragraph"} for (s, e) in offs]
            pages.append(dict(url=url, warc_ts=ts, html=raw, text=expected, lang=lang))
            truth.append(dict(url=url, expected_text=expected, expected_spans=spans, case=case))
            continue

        content = ([] if case == "empty_content"
                   else _content_blocks(r, case, content_scale))
        charset = "iso-8859-1" if case == "latin1" else "utf-8"
        if case == "latin1":
            # é/ü guaranteed non-ASCII content
            content = [(k, f.replace("lorem", "café").replace("ipsum", "über"),
                        e.replace("lorem", "café").replace("ipsum", "über"))
                       for (k, f, e) in content]
        page = _assemble_page(r, domain, case, content, charset=charset)
        raw = page.encode("iso-8859-1" if case == "latin1" else "utf-8")

        if case == "fail_truncated":
            # cut one byte into a multibyte char → undecodable under utf-8
            marker = "café"
            page_t = page.replace("</body>", f"<p>{marker}</p></body>")
            raw_t = page_t.encode("utf-8")
            idx = raw_t.find("é".encode("utf-8"))
            raw = raw_t[: idx + 1]
            pages.append(dict(url=url, warc_ts=ts, html=raw, text="", lang=lang))
            truth.append(dict(url=url, expected_text=None, expected_spans=None, case=case))
            continue

        expected, offs = join_blocks([e for (_k, _f, e) in content])
        spans = [{"start": s, "end": e, "kind": k}
                 for ((_k0, _f, _e), (s, e)), k in
                 zip(zip(content, offs), [k for (k, _f, _e) in content])]
        visible = "\n".join([e for (_k, _f, e) in content] + [f"Site {domain}"])
        pages.append(dict(url=url, warc_ts=ts, html=raw, text=visible, lang=lang))
        truth.append(dict(url=url, expected_text=expected, expected_spans=spans, case=case))

        if i % 50 == 0:
            # recrawl: same url & content, later ts, different boilerplate
            r2 = _rng(seed, i, "recrawl")
            page2 = _assemble_page(r2, domain, case, content, charset=charset)
            raw2 = page2.encode("iso-8859-1" if case == "latin1" else "utf-8")
            pages.append(dict(url=url, warc_ts=ts + timedelta(days=1), html=raw2,
                              text=visible, lang=lang))
    return pages, truth


# ---------------------------------------------------------------------------
# parquet materialization (pyarrow; no Spark needed for unit tests)
# ---------------------------------------------------------------------------

def write_corpus_parquet(out_dir: str, n: int, seed: int = 42, skew: bool = False,
                         content_scale: int = 1,
                         row_group_rows: int = 1000) -> tuple[str, str]:
    """Write web_pages.parquet + truth.parquet under out_dir; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pages, truth = make_corpus(n, seed=seed, skew=skew, content_scale=content_scale)
    os.makedirs(out_dir, exist_ok=True)

    pages_schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    pages_tbl = pa.Table.from_pylist(pages, schema=pages_schema)
    pages_path = os.path.join(out_dir, "web_pages.parquet")
    # small row groups: Spark splits parquet at row-group boundaries, so scan
    # parallelism of a single file is bounded by group count — one giant group
    # serializes the whole scan into one task
    pq.write_table(pages_tbl, pages_path, row_group_size=row_group_rows)

    span_t = pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
    truth_schema = pa.schema([
        ("url", pa.string()),
        ("expected_text", pa.string()),
        ("expected_spans", pa.list_(span_t)),
        ("case", pa.string()),
    ])
    truth_tbl = pa.Table.from_pylist(truth, schema=truth_schema)
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(truth_tbl, truth_path)
    return pages_path, truth_path
