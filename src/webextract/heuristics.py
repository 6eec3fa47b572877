"""Boilerplate classification — trafilatura/readability-style, fully specified.

This is the engine's *Extractor* stage (reference
``base/extractor/base_extractor.py:56-75``): structured document → extraction
payload. The reference leaves the extractor pluggable; the north rule pins
ours to DOM heuristics: **tag/class blocklists, link-density pruning,
text-density scoring**. Byte-identity demands the rules be total and
deterministic, so they are ordered and threshold-exact:

A block is BOILERPLATE iff (first matching rule wins):
  B1. it sits under a boilerplate container (<nav>/<header>/<footer>/<aside>)
      or under an element whose class/id matches CLASS_BLOCKLIST;
  B2. its own class/id matches CLASS_BLOCKLIST;
  B3. its normalized text is empty;
  B4. its link density (link non-ws chars / total non-ws chars) >= 0.5;
  B5. it is a short link-bearing block: total non-ws chars < MIN_CHARS and
      link_chars > 0  (kills "read more"-style stubs readability drops).
Everything else is CONTENT and keeps its kind (title/paragraph/quote).
"""

from __future__ import annotations

import re

from .htmlblocks import Block
from .textnorm import normalize_ws

# Substring-token match on class/id text (word-ish boundaries so that e.g.
# "navigation" matches via token "navigation" but "unavailable" does not).
CLASS_BLOCKLIST = re.compile(
    r"(?:^|[\s_-])("
    r"sidebar|side-bar|ads?|advert(?:isement)?s?|banner|cookie(?:-banner)?|"
    r"share(?:-buttons)?|social|menu|nav|navigation|navbar|footer|header|"
    r"comments?|promo|widget|breadcrumbs?|related|pagination|pager|popup|"
    r"modal|subscribe|newsletter|masthead|byline|meta|tags|disclaimer|legal"
    r")(?:$|[\s_-])"
)

LINK_DENSITY_MAX = 0.5   # B4: >= 0.5 is boilerplate
MIN_CHARS_LINKED = 25    # B5: shorter than this AND containing a link → drop


def is_boilerplate(block: Block, *, link_density_max: float = LINK_DENSITY_MAX,
                   min_chars_linked: int = MIN_CHARS_LINKED,
                   _norm_text: str | None = None) -> bool:
    """Apply rules B1–B5. Deterministic; no randomness, no global state.

    Thresholds are overridable per run via ExtractorConfig (config.py) but
    default to the byte-identity spec values. ``_norm_text`` lets callers
    that already normalized the block text avoid doing it twice.
    """
    if block.boiler_ancestor:
        return True
    if block.own_class and CLASS_BLOCKLIST.search(block.own_class):
        return True
    text = normalize_ws(block.raw_text) if _norm_text is None else _norm_text
    if not text:
        return True
    if block.total_chars > 0 and block.link_chars / block.total_chars >= link_density_max:
        return True
    if block.total_chars < min_chars_linked and block.link_chars > 0:
        return True
    return False


def select_content(blocks: list[Block], *,
                   link_density_max: float = LINK_DENSITY_MAX,
                   min_chars_linked: int = MIN_CHARS_LINKED) -> list[tuple[str, str]]:
    """Clean stage: keep content blocks, in document order.

    Returns ``[(kind, normalized_text), ...]``.
    """
    out: list[tuple[str, str]] = []
    for b in blocks:
        # cheap structural rules first; normalize once, reuse for the rest
        if b.boiler_ancestor or (b.own_class and CLASS_BLOCKLIST.search(b.own_class)):
            continue
        text = normalize_ws(b.raw_text)
        if is_boilerplate(b, link_density_max=link_density_max,
                          min_chars_linked=min_chars_linked, _norm_text=text):
            continue
        out.append((b.kind, text))
    return out
