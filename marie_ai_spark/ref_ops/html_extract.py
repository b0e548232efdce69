"""HTML main-content extraction: tag-skip walk + link/text-density heuristics.

The reference's HTML handling skips {script, style, head, meta, noscript}
during a stdlib-HTMLParser walk and joins the remaining text
(marie/agent/tools/utilities/web_fetch.py:23-46). Per the project north star
we extend that seed with Readability/trafilatura-style block scoring: chrome
candidates (<nav>, <footer>, <header>, <aside>) are dropped when their
link-density (chars inside <a> / total chars) exceeds a threshold — the
"content vs chrome" decision that the reference makes with a GPU overlay
model (marie/overlay/overlay.py:355-372) is made here with DOM heuristics.

Output: (clean_text, spans, n_lines) where spans are (start, end, label,
action) char offsets into the ORIGINAL html string; labels:
  'script_style' (drop), 'nav' (drop, high link density), 'content' (keep).
"""

from __future__ import annotations

from html.parser import HTMLParser

SKIP_TAGS = {"script", "style", "head", "meta", "noscript", "title"}
CHROME_TAGS = {"nav", "footer", "header", "aside"}
LINK_DENSITY_DROP = 0.5
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
         "embed", "source", "track", "wbr"}


class _Walker(HTMLParser):
    """Collect text segments with absolute char offsets and their DOM context."""

    def __init__(self, raw: str):
        super().__init__(convert_charrefs=False)
        self.raw = raw
        # absolute offset of the start of each source line, for getpos() math
        starts = [0]
        pos = 0
        for seg in raw.split("\n")[:-1]:
            pos += len(seg) + 1
            starts.append(pos)
        self._line_starts = starts
        self.stack: list[str] = []
        # segments: (start, end, text, skip_depth>0, chrome_key or None, in_link)
        self.segments = []
        self._chrome_seq = 0
        self._chrome_keys: list[int] = []  # parallel to stack entries in CHROME_TAGS
        self._skip_depth = 0
        self._link_depth = 0

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            return
        self.stack.append(tag)
        if tag in SKIP_TAGS:
            self._skip_depth += 1
        if tag in CHROME_TAGS:
            self._chrome_seq += 1
            self._chrome_keys.append(self._chrome_seq)
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        if tag not in self.stack:
            # stray end tag (</div> with no open <div>): ignore it instead
            # of unwinding the whole stack — unwinding would zero the
            # skip/chrome/link depths and misclassify the rest of the
            # document on malformed HTML
            return
        # pop to the matching open tag (tolerates mild nesting errors)
        while self.stack:
            top = self.stack.pop()
            if top in SKIP_TAGS:
                self._skip_depth -= 1
            if top in CHROME_TAGS:
                self._chrome_keys.pop()
            if top == "a":
                self._link_depth -= 1
            if top == tag:
                break

    def handle_data(self, data):
        if not data or data.isspace():
            return
        start = self._abs()
        self.segments.append(
            (
                start,
                start + len(data),
                data,
                self._skip_depth > 0,
                self._chrome_keys[-1] if self._chrome_keys else None,
                self._link_depth > 0,
            )
        )


def extract_html(text: str):
    w = _Walker(text)
    try:
        w.feed(text)
        w.close()
    except Exception:
        pass

    # link-density per chrome block: drop the block iff density > threshold
    link_chars: dict[int, int] = {}
    total_chars: dict[int, int] = {}
    for _s, _e, data, skip, ck, in_link in w.segments:
        if ck is None or skip:
            continue
        n = len(data.strip())
        total_chars[ck] = total_chars.get(ck, 0) + n
        if in_link:
            link_chars[ck] = link_chars.get(ck, 0) + n
    drop_chrome = {
        ck
        for ck, tot in total_chars.items()
        if tot > 0 and link_chars.get(ck, 0) / tot > LINK_DENSITY_DROP
    }

    kept: list[str] = []
    raw_spans = []  # (start, end, label, action)
    for s, e, data, skip, ck, _in_link in w.segments:
        if skip:
            raw_spans.append((s, e, "script_style", "drop"))
        elif ck is not None and ck in drop_chrome:
            raw_spans.append((s, e, "nav", "drop"))
        else:
            kept.append(data.strip())
            raw_spans.append((s, e, "content", "keep"))

    # merge adjacent spans with identical (label, action)
    spans = []
    for sp in raw_spans:
        if spans and spans[-1][2] == sp[2] and spans[-1][3] == sp[3]:
            spans[-1] = (spans[-1][0], sp[1], sp[2], sp[3])
        else:
            spans.append(sp)

    clean = " ".join(t for t in kept if t)
    n_lines = 1 if clean else 0
    return clean, spans, n_lines
