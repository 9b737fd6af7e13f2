"""HTML boilerplate strip + main-content extraction → spans.

The headline stage of the engine (north rule: "HTML boilerplate strip,
DOM tree pruning with link-density/text-density heuristics"). Built from
scratch on ``html.parser`` (no bs4/markdownify in this environment), but
behavior-faithful to the reference:

  * drop ``<script>/<style>`` subtrees          (url_processor.py:252-253)
  * ``<title>`` becomes the ``#`` H1 heading     (url_processor.py:258-262)
  * main-content selection: first of ``main, [role=main], .main-content,
    .content, #content, article, .post-content, .entry-content``, else
    ``<body>``                                   (url_processor.py:316-325)
  * ATX headings for h1..h6 (markdownify ``heading_style="ATX"``,
    html_processor.py:60)
  * whitespace cleanup                           (url_processor.py:335-360)

North-rule augmentation beyond the reference: structural boilerplate
pruning (``nav/header/footer/aside`` dropped inside the selected
content), link-density pruning (a container whose anchor-text fraction
exceeds ``LINK_DENSITY_MAX`` with >= ``MIN_LINKS_FOR_PRUNE`` links is
navigation, not content), and text-density pruning (tag-dense,
text-sparse containers — icon bars, button rows — are chrome).
"""

from __future__ import annotations

from html.parser import HTMLParser

from docstrange_ray.extract.table_extract import grid_to_markdown

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
DROP_TAGS = frozenset({"script", "style", "noscript", "template", "iframe"})
STRUCTURAL_BOILERPLATE = frozenset({"nav", "header", "footer", "aside"})

LINK_DENSITY_MAX = 0.6
MIN_LINKS_FOR_PRUNE = 3
# Text-density pruning: a tag-dense, text-sparse container (icon bars,
# button rows, social widgets) averaging under this many text chars per
# element across at least MIN_ELEMS elements is chrome, not content.
TEXT_DENSITY_MIN_CHARS_PER_ELEM = 3
TEXT_DENSITY_MIN_ELEMS = 5

# Main-content selectors in reference priority order (url_processor.py:316-325).
_MAIN_SELECTORS = (
    ("tag", "main"),
    ("role", "main"),
    ("class", "main-content"),
    ("class", "content"),
    ("id", "content"),
    ("tag", "article"),
    ("class", "post-content"),
    ("class", "entry-content"),
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (tolerant parsing)
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    return b.root


# ---------------------------------------------------------------------------


def _find_first(root: Node, pred) -> Node | None:
    stack = [root]
    while stack:
        node = stack.pop(0)
        for c in node.children:
            if isinstance(c, Node):
                if pred(c):
                    return c
                stack.append(c)
    return None


def _classes(node: Node) -> set[str]:
    return set((node.attrs.get("class") or "").split())


def select_main_content(root: Node) -> Node | None:
    """First match of the reference's selector list, else <body>, else root
    (url_processor.py:316-325)."""
    for sel_kind, sel_val in _MAIN_SELECTORS:
        if sel_kind == "tag":
            hit = _find_first(root, lambda n: n.tag == sel_val)
        elif sel_kind == "role":
            hit = _find_first(root, lambda n: n.attrs.get("role") == sel_val)
        elif sel_kind == "class":
            hit = _find_first(root, lambda n: sel_val in _classes(n))
        else:  # id
            hit = _find_first(root, lambda n: n.attrs.get("id") == sel_val)
        if hit is not None:
            return hit
    body = _find_first(root, lambda n: n.tag == "body")
    return body if body is not None else root


def _link_stats(node: Node) -> tuple[int, int, int, int]:
    """(total_text_chars, linked_text_chars, n_links, n_elements) for a
    subtree."""
    total, linked, links, elems = 0, 0, 0, 0
    stack: list[tuple[Node | str, bool]] = [(c, False) for c in node.children]
    while stack:
        item, in_link = stack.pop()
        if isinstance(item, str):
            n = len(" ".join(item.split()))
            total += n
            if in_link:
                linked += n
        else:
            elems += 1
            is_link = in_link or item.tag == "a"
            if item.tag == "a":
                links += 1
            stack.extend((c, is_link) for c in item.children)
    return total, linked, links, elems


def is_boilerplate(node: Node) -> bool:
    """Structural + link-density + text-density boilerplate test for a
    container node (north rule: DOM tree pruning with
    link-density/text-density heuristics)."""
    if node.tag in STRUCTURAL_BOILERPLATE:
        return True
    if node.tag in ("div", "section", "ul", "ol", "p"):
        total, linked, links, elems = _link_stats(node)
        if links >= MIN_LINKS_FOR_PRUNE and total > 0 and linked / total > LINK_DENSITY_MAX:
            return True
        if (
            elems >= TEXT_DENSITY_MIN_ELEMS
            and total < elems * TEXT_DENSITY_MIN_CHARS_PER_ELEM
        ):
            return True
    return False


# --- inline rendering (markdownify-equivalent subset) ----------------------


def _render_inline(node: Node | str, images: list[dict]) -> str:
    if isinstance(node, str):
        return node
    tag = node.tag
    if tag in DROP_TAGS:
        return ""
    if tag == "img":
        images.append(
            {
                "kind": "image-ref",
                "text": node.attrs.get("alt", ""),
                "media_ref": node.attrs.get("src", ""),
            }
        )
        return ""
    if tag == "br":
        return " "
    inner = "".join(_render_inline(c, images) for c in node.children)
    compact = " ".join(inner.split())
    if not compact:
        return inner if tag in ("a",) else inner
    if tag == "a":
        href = node.attrs.get("href", "")
        return f" [{compact}]({href}) " if href else inner
    if tag in ("strong", "b"):
        return f" **{compact}** "
    if tag in ("em", "i"):
        return f" *{compact}* "
    if tag == "code":
        return f" `{compact}` "
    return inner


def _table_grid(node: Node) -> list[list[str]]:
    grid: list[list[str]] = []
    stack = [node]
    while stack:
        cur = stack.pop(0)
        for c in cur.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "tr":
                row = []
                for cell in c.children:
                    if isinstance(cell, Node) and cell.tag in ("td", "th"):
                        imgs: list[dict] = []
                        row.append(" ".join(_render_inline(cell, imgs).split()))
                grid.append(row)
            elif c.tag in ("thead", "tbody", "tfoot", "table"):
                stack.append(c)
    return grid


# --- block walk ------------------------------------------------------------

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_CONTAINERS = frozenset(
    {"div", "section", "article", "main", "body", "html", "#root", "span-root"}
)


def _emit_blocks(node: Node, spans: list[dict]) -> None:
    """Walk a content subtree in document order, emitting spans."""
    pending_text: list[str] = []
    pending_images: list[dict] = []

    def flush() -> None:
        text = " ".join(" ".join(pending_text).split())
        pending_text.clear()
        if text:
            spans.append({"kind": "text", "text": text, "media_ref": ""})
        spans.extend(pending_images)
        pending_images.clear()

    for child in node.children:
        if isinstance(child, str):
            if child.strip():
                pending_text.append(child)
            continue
        tag = child.tag
        if tag in DROP_TAGS or is_boilerplate(child):
            continue
        if tag in _HEADINGS:
            flush()
            imgs: list[dict] = []
            title = " ".join(_render_inline(child, imgs).split())
            if title:
                spans.append(
                    {
                        "kind": "heading",
                        "text": "#" * _HEADINGS[tag] + " " + title,
                        "media_ref": "",
                    }
                )
            spans.extend(imgs)
        elif tag == "p":
            flush()
            imgs = []
            text = " ".join(_render_inline(child, imgs).split())
            if text:
                spans.append({"kind": "text", "text": text, "media_ref": ""})
            spans.extend(imgs)
        elif tag in ("ul", "ol"):
            flush()
            idx = 0
            for li in child.children:
                if isinstance(li, Node) and li.tag == "li":
                    idx += 1
                    imgs = []
                    item = " ".join(_render_inline(li, imgs).split())
                    if item:
                        marker = f"{idx}." if tag == "ol" else "-"
                        spans.append(
                            {
                                "kind": "list_item",
                                "text": f"{marker} {item}",
                                "media_ref": "",
                            }
                        )
                    spans.extend(imgs)
        elif tag == "table":
            flush()
            grid = _table_grid(child)
            if grid:
                spans.append(
                    {"kind": "table", "text": grid_to_markdown(grid), "media_ref": ""}
                )
        elif tag == "pre":
            flush()
            code = _raw_text(child)
            code = code.strip("\n")
            if code:
                spans.append(
                    {"kind": "code", "text": f"```\n{code}\n```", "media_ref": ""}
                )
        elif tag == "blockquote":
            flush()
            imgs = []
            text = " ".join(_render_inline(child, imgs).split())
            if text:
                spans.append({"kind": "text", "text": "> " + text, "media_ref": ""})
            spans.extend(imgs)
        elif tag == "img":
            flush()
            spans.append(
                {
                    "kind": "image-ref",
                    "text": child.attrs.get("alt", ""),
                    "media_ref": child.attrs.get("src", ""),
                }
            )
        elif tag in _BLOCK_CONTAINERS or tag not in VOID_TAGS:
            flush()
            _emit_blocks(child, spans)
    flush()


def _raw_text(node: Node) -> str:
    out = []
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        elif c.tag not in DROP_TAGS:
            out.append(_raw_text(c))
    return "".join(out)


def html_to_spans(payload: str) -> list[dict]:
    """Full HTML extraction: parse → title heading → main-content select →
    boilerplate prune → block walk → spans."""
    root = parse_html(payload)
    spans: list[dict] = []
    title_node = _find_first(root, lambda n: n.tag == "title")
    if title_node is not None:
        title = " ".join(_raw_text(title_node).split())
        if title:
            spans.append({"kind": "heading", "text": f"# {title}", "media_ref": ""})
    content = select_main_content(root)
    if content is not None:
        _emit_blocks(content, spans)
    return spans
