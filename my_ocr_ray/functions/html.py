"""HTML main-content extraction via text-density / link-density block scoring.

New scope relative to the reference (the target adds HTML boilerplate
stripping, Readability/CETD-style). Pure stdlib ``html.parser``; no external
DOM libraries. Deterministic.

Method (CETD-flavored):
  1. parse into block-level segments (block tags open/close segment buffers);
  2. per block, compute text length, anchor-text length, tag count and depth;
  3. composite score = text_len * (1 - link_density) / (1 + 0.3 * tag_count);
  4. keep blocks scoring >= ``threshold_ratio`` * max block score and with
     link density below ``max_link_density``.
Kept block texts are whitespace-normalized and joined with "\\n".
"""
from __future__ import annotations

from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
}
SKIP_TAGS = {"script", "style", "head", "nav", "footer", "aside"}


class _BlockCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._anchor_chars = 0
        self._tag_count = 0
        self._depth = 0
        self._skip_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "anchor_chars": self._anchor_chars,
                    "tag_count": self._tag_count,
                    "depth": self._depth,
                }
            )
        self._buf = []
        self._anchor_chars = 0
        self._tag_count = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._depth += 1
        elif tag == "a":
            self._anchor_depth += 1
            self._tag_count += 1
        else:
            self._tag_count += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("body", "html"):
            # wild-HTML guard: an unclosed <nav>/<aside> would otherwise
            # swallow every block after it; </body> implicitly closes any
            # open skip region (matching the HTML5 tree-builder's implied
            # end tags)
            self._skip_depth = 0
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._depth = max(0, self._depth - 1)
        elif tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(data)


def html_blocks(html: str) -> list[dict]:
    """Parse HTML into scored block segments."""
    p = _BlockCollector()
    p.feed(html)
    p._flush()
    for b in p.blocks:
        n = len(b["text"])
        ld = b["anchor_chars"] / n if n else 0.0
        b["link_density"] = round(ld, 6)
        b["score"] = round(n * (1.0 - ld) / (1.0 + 0.3 * b["tag_count"]), 6)
    return p.blocks


def extract_main_html(
    html: str, threshold_ratio: float = 0.2, max_link_density: float = 0.5
) -> str:
    """Main-content text of an HTML document (boilerplate stripped)."""
    blocks = html_blocks(html)
    if not blocks:
        return ""
    mx = max(b["score"] for b in blocks)
    if mx <= 0:
        return ""
    kept = [
        b["text"]
        for b in blocks
        if b["score"] >= threshold_ratio * mx and b["link_density"] <= max_link_density
    ]
    return "\n".join(kept)
