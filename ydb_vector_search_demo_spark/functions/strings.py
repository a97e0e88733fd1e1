"""Scalar string/presentation functions (SURVEY.md §2.4 F1-F16).

The reference's entire scalar-function library lives in its frontend
(/root/reference/static/js/script.js) and backend (app.py). Every one is
re-expressed as a pure Spark Column expression — built-in functions only,
JVM-side, whole-stage-codegen friendly; no Python UDFs anywhere in this
module. Each builder documents the reference location it mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- F6
def truncate_text(col: ColumnOrName, max_length: int = 300) -> Column:
    """Word-boundary truncation (script.js:294-308, called with 300 at
    script.js:229): if the text fits, keep it; otherwise cut to
    ``max_length`` chars, and if the last space in the cut falls past 80%
    of the limit, cut at that space instead; append '...'.

    JS ``lastIndexOf(' ')`` is 0-based; with Spark's 1-based positions,
    ``last_space_1b = max_length - instr(reverse(cut), ' ') + 1`` when a
    space exists, and the JS condition ``lastSpaceIndex > max*0.8``
    becomes ``last_space_1b - 1 > max*0.8``. ``substring(0, lastSpace)``
    keeps ``lastSpace`` chars (i.e. drops the space itself).
    """
    t = _c(col)
    cut = F.substring(t, 1, max_length)
    rev_pos = F.instr(F.reverse(cut), " ")  # 0 if no space
    last_space_0b = F.lit(max_length) - rev_pos  # JS lastIndexOf semantics
    cut_at_space = F.concat(F.substring(t, 1, last_space_0b), F.lit("..."))
    return (
        F.when(F.length(t) <= max_length, t)
        .when(
            (rev_pos > 0) & (last_space_0b > F.lit(max_length * 0.8)),
            cut_at_space,
        )
        .otherwise(F.concat(cut, F.lit("...")))
    )


# ---------------------------------------------------------------- F7
def format_score(col: ColumnOrName) -> Column:
    """Score display format (script.js:310-319): <0.001 → 2-digit
    exponential; <1 → 3 fixed decimals; else 2 fixed decimals.

    JS ``toExponential(2)`` prints the exponent unpadded (``1.23e-4``)
    while Java's ``%.2e`` zero-pads (``1.23e-04``) — strip the pad for
    byte-exact reference parity."""
    s = _c(col).cast("double")
    exp = F.regexp_replace(
        F.format_string("%.2e", s), r"e([+-])0(\d)$", r"e$1$2"
    )
    return (
        F.when(s < 0.001, exp)
        .when(s < 1, F.format_string("%.3f", s))
        .otherwise(F.format_string("%.2f", s))
    )


# ---------------------------------------------------------------- F8
def strip_markdown_headers(col: ColumnOrName) -> Column:
    """Markdown-header removal (script.js:278-292): delete ``#``-header
    lines (multiline), collapse triple newlines, trim."""
    t = _c(col)
    t = F.regexp_replace(t, r"(?m)^\s*#{1,6}\s*.*$", "")
    t = F.regexp_replace(t, r"\n\s*\n\s*\n", "\n\n")
    # JS .trim() strips ALL whitespace incl. newlines; Spark's trim()
    # strips only spaces — use a regex for reference fidelity
    return F.regexp_replace(t, r"^\s+|\s+$", "")


# ---------------------------------------------------------------- F9
def escape_html(col: ColumnOrName) -> Column:
    """HTML entity escaping (script.js:176-183, 250-257). Order matters:
    '&' must be escaped first."""
    t = _c(col)
    for raw, ent in (
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#039;"),
    ):
        t = F.replace(t, F.lit(raw), F.lit(ent))
    return t


# ---------------------------------------------------------------- F10
def split_paragraphs(col: ColumnOrName) -> Column:
    """Split on blank lines, drop whitespace-only parts (script.js:189)."""
    parts = F.split(_c(col), r"\n\n")
    return F.filter(parts, lambda p: F.trim(p) != "")


# ---------------------------------------------------------------- F11
def newlines_to_html(col: ColumnOrName) -> Column:
    """Newline → HTML rewriting (script.js:266-275): ``\\n\\n+`` becomes a
    paragraph break, single ``\\n`` a <br>, and the whole string is
    wrapped in <p>...</p> only when a paragraph break was produced."""
    t = F.regexp_replace(_c(col), r"\n\n+", "</p><p>")
    t = F.regexp_replace(t, r"\n", "<br>")
    return F.when(
        t.contains("</p><p>"), F.concat(F.lit("<p>"), t, F.lit("</p>"))
    ).otherwise(t)


# ---------------------------------------------------------------- F12
_ANCHOR_RE = r"^(.+?)\s*\{#([^}]+)\}\s*$"


def extract_anchor_text(col: ColumnOrName) -> Column:
    """Header text with any ``{#anchor}`` suffix removed (script.js:380-395).
    regexp_extract returns '' on no match, so fall back to the raw header."""
    h = _c(col)
    ext = F.regexp_extract(h, _ANCHOR_RE, 1)
    return F.when(h.isNull(), F.lit(None)).when(ext != "", F.trim(ext)).otherwise(h)


def extract_anchor_id(col: ColumnOrName) -> Column:
    """The ``{#anchor}`` id, or null when absent (script.js:380-395)."""
    h = _c(col)
    ext = F.regexp_extract(h, _ANCHOR_RE, 2)
    return F.when(ext != "", ext).otherwise(F.lit(None))


# ---------------------------------------------------------------- F13
def breadcrumb(h1: ColumnOrName, h2: ColumnOrName, h3: ColumnOrName,
               separator: str = " > ") -> Column:
    """Ordered h1→h2→h3 breadcrumb, missing levels skipped
    (script.js:330-378). ``concat_ws`` skips nulls natively. Returns null
    (not '') when no headers are present, matching the JS null return."""
    parts = F.concat_ws(
        separator,
        extract_anchor_text(h1),
        extract_anchor_text(h2),
        extract_anchor_text(h3),
    )
    return F.when(parts == "", F.lit(None)).otherwise(parts)


def last_anchor(h1: ColumnOrName, h2: ColumnOrName, h3: ColumnOrName) -> Column:
    """'Last anchor wins' (script.js:335-350): the deepest present header
    with an anchor supplies the fragment."""
    return F.coalesce(
        extract_anchor_id(h3), extract_anchor_id(h2), extract_anchor_id(h1)
    )


# ---------------------------------------------------------------- F14
SOURCE_URL_PREFIX = "https://yandex.ru/support/market/ru/"


def source_link(source_path: ColumnOrName, anchor: Column | None = None) -> Column:
    """Source-link synthesis (script.js:403-418 + anchor splice at :357):
    prefix + source_path, plus '#anchor' when an anchor is present; null
    when source_path is null/empty."""
    sp = _c(source_path)
    base = F.concat(F.lit(SOURCE_URL_PREFIX), sp)
    if anchor is not None:
        base = F.when(anchor.isNotNull(), F.concat(base, F.lit("#"), anchor)).otherwise(base)
    return F.when(sp.isNull() | (sp == ""), F.lit(None)).otherwise(base)


# ---------------------------------------------------------------- F16
def percent_of_total(part: ColumnOrName, total: ColumnOrName) -> Column:
    """Stage share of total, 1 decimal place (script.js:522-529)."""
    return F.round(_c(part) / _c(total) * 100.0, 1)
