"""Pure-Python text kernels — the single source of truth for semantics.

These functions are used BOTH by the Spark pandas UDFs
(searchengine_spark.functions.udfs) and by the single-node oracle
(tests/oracle.py), which is what makes the per-row invariant
("byte-identical extracted text per url") checkable.

Reference semantics reproduced:
  * extract_text — Jsoup wholeText + whitespace normalization
    (reference: mapper/WebpageMapper.java:38-52): strip tags, '\n' and
    '\t' → ' ', collapse 2+ spaces to one, strip ONE leading space.
  * tokenize — char-class strip + lowercase + single-space split
    (reference: mapper/LemmaMapper.java:82-111). We fix the reference's
    untrimmed-token quirk (LemmaMapper.java:93-101 adds the substring
    BEFORE hyphen-trim) — here the trimmed token is used, documented.
  * lemmatize — dictionary normal forms with multi-lemma expansion and
    POS stop-filter (reference: mapper/LemmaMapper.java:15-43,78-80).
"""

from __future__ import annotations

import re

from .lemma_dict import LEMMA_DICT, STOP_POS

# ---------------------------------------------------------------------------
# extract_text (reference: mapper/WebpageMapper.java:44-52 + Jsoup wholeText)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_MULTISPACE_RE = re.compile(r" {2,}")

# minimal entity set — the synthetic corpus only emits these; a real
# deployment swaps in html.unescape behind the same function signature.
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must be last
]


def extract_text(html: bytes | str | None) -> str | None:
    """HTML → normalized whole text (byte-identity contract).

    Steps: utf-8 decode → drop <script>/<style>/comments → strip tags →
    unescape entities → '\n','\t'→' ' → collapse 2+ spaces → strip one
    leading space. The '&' containment pre-check skips the six entity
    replace passes when no entity can be present — pure fast path, the
    output is identical either way ('&' is exact: every entity starts
    with it).
    """
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    if "&" in s:
        for ent, ch in _ENTITIES:
            s = s.replace(ent, ch)
    s = s.replace("\n", " ").replace("\t", " ")
    s = _MULTISPACE_RE.sub(" ", s)
    if s.startswith(" "):
        s = s[1:]
    return s


# ---------------------------------------------------------------------------
# tokenize (reference: mapper/LemmaMapper.java:82-111)
# ---------------------------------------------------------------------------

# Generalized char class: the reference keeps only Cyrillic + '-' + ' '
# ([А-Яа-яёЁ -], LemmaMapper.java:84); we extend with Latin+digits so the
# engine also serves non-Russian corpora. TOKEN_MODE='ru' reproduces the
# reference class exactly.
# Implementation note: the reference's replace-with-space + split-on-space
# yields exactly the maximal runs of in-class characters, so a single
# findall of the positive class is byte-equivalent and ~2× faster than
# sub + split (locked by test_textproc + a fuzz equivalence test).
_KEEP_RE = {
    "general": re.compile(r"[^a-zа-яё0-9\- ]"),  # kept for documentation
    "ru": re.compile(r"[^а-яё\- ]"),
}
_TOKEN_RE = {
    "general": re.compile(r"[a-zа-яё0-9\-]+"),
    "ru": re.compile(r"[а-яё\-]+"),
}


def tokenize(text: str | None, mode: str = "general") -> list[str]:
    """Lowercase, strip to char class, split on single spaces, drop
    empty/'-'-only tokens, trim leading/trailing hyphens."""
    if text is None:
        return []
    out: list[str] = []
    append = out.append
    for tok in _TOKEN_RE[mode].findall(text.lower()):
        tok = tok.strip("-")
        if tok:
            append(tok)
    return out


# ---------------------------------------------------------------------------
# lemmatize (reference: mapper/LemmaMapper.java:15-43,78-80)
# ---------------------------------------------------------------------------


# surface → tuple of lemmas with the stop-POS filter pre-applied: the
# per-token hot path is then one dict probe, no per-call list build
_LEMMA_FLAT: dict[str, tuple[str, ...]] = {
    s: tuple(lm for lm, pos in pairs if pos not in STOP_POS)
    for s, pairs in LEMMA_DICT.items()
}


def lemmatize_token(tok: str) -> list[str]:
    """One surface token → 0..N lemmas (multi-lemma expansion kept,
    stop-POS candidates dropped, identity fallback for OOV)."""
    hit = _LEMMA_FLAT.get(tok)
    return [tok] if hit is None else list(hit)


def tokenize_lemmatize(text: str | None, mode: str = "general") -> list[str]:
    """text → flattened lemma list (the per-doc token stream whose
    counts form the postings; reference: LemmaMapper.java:15-43).
    Fused tokenize+lemmatize loop — this is the single hottest Python
    path in the build (once per corpus token), so it avoids the
    intermediate token list and per-token function calls."""
    if text is None:
        return []
    out: list[str] = []
    append, extend = out.append, out.extend
    flat_get = _LEMMA_FLAT.get
    for tok in _TOKEN_RE[mode].findall(text.lower()):
        tok = tok.strip("-")
        if not tok:
            continue
        hit = flat_get(tok)
        if hit is None:
            append(tok)
        else:
            extend(hit)
    return out


# ---------------------------------------------------------------------------
# snippets (reference: mapper/SnippetMapper.java:13-142)
# ---------------------------------------------------------------------------


def make_snippet(text: str | None, query_lemmas: list[str], radius: int = 3) -> str:
    """Highlighted snippet: find words whose lemmas hit the query, take
    ±radius words around each hit, merge overlapping intervals, wrap
    hits in <b>, join fragments with ' ... '.

    Word-window semantics instead of the reference's char-walk
    (SnippetMapper.java:65-93) — same product (radius words each side),
    simpler and codepoint-safe.
    """
    if not text:
        return ""
    qset = set(query_lemmas)
    words = text.split(" ")
    hits: list[int] = []
    for i, w in enumerate(words):
        toks = tokenize(w)
        lemmas = {lm for t in toks for lm in lemmatize_token(t)}
        if lemmas & qset:
            hits.append(i)
    if not hits:
        return ""
    # intervals of word indices, merged when overlapping/adjacent
    # (reference: SnippetMapper.java:29-63, SnippetIndex.java:15-18)
    intervals: list[list[int]] = []
    for i in hits:
        lo, hi = max(0, i - radius), min(len(words) - 1, i + radius)
        if intervals and lo <= intervals[-1][1] + 1:
            intervals[-1][1] = max(intervals[-1][1], hi)
        else:
            intervals.append([lo, hi])
    hitset = set(hits)
    frags = []
    for lo, hi in intervals:
        frag = " ".join(
            f"<b>{words[i]}</b>" if i in hitset else words[i] for i in range(lo, hi + 1)
        )
        frags.append(frag)
    return " ... ".join(frags)


# ---------------------------------------------------------------------------
# char-walk snippet mode (reference parity; SnippetMapper.java:13-142)
# ---------------------------------------------------------------------------

# isPartOfWord (SnippetMapper.java:118-122): Cyrillic/Latin letters and
# hyphen — digits are NOT word chars in the reference's walk
_WORD_CHARS = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"


def _is_word_char(c: str) -> bool:
    lc = c.lower()
    return ("a" <= lc <= "z") or (lc in _WORD_CHARS) or c == "-"


def _snippet_border(content: str, start: int, radius: int, right: bool) -> int:
    """One border of a snippet window: walk `radius` words out from
    `start`, stopping early at a bracket ('<' scanning right, '>'
    scanning left — never walk into markup). Faithful port of the
    reference's cursor automaton (SnippetMapper.java:65-93), with one
    hardening: positions beyond either end read as a space (the Java
    indexes charAt unguarded and relies on content shape)."""
    n = len(content)
    pos = start
    bracket = "<" if right else ">"
    step = 1 if right else -1

    def ch(p: int) -> str:
        return content[p] if 0 <= p < n else " "

    def within(p: int) -> bool:
        return p < n if right else p > 0

    wc = 0
    while wc < radius:
        while not _is_word_char(ch(pos)) and within(pos):
            if ch(pos) == bracket:
                pos -= step
                break
            pos += step
        while _is_word_char(ch(pos)) and within(pos):
            pos += step
        wc += 1
        if ch(pos) == bracket:
            pos -= step
            break
    return max(0, min(pos, n))


def make_snippet_charwalk(
    text: str | None, query_lemmas: list[str], radius: int = 3
) -> str:
    """Reference-parity snippet mode (SnippetMapper.java:13-142):
    char-walk ±radius WORDS from each hit with bracket stops, merge
    overlapping [start,end] intervals to a fixpoint, excerpt the raw
    content, '... frag ... <...> ...' framing, then <b>-wrap each hit
    surface at its first occurrence.

    Kept beside the word-window default (make_snippet — the
    oracle-checked mode). Documented divergences from the Java:
      * hit surfaces are our tokenizer's lowercase tokens located with
        str.find, so a capitalized occurrence positions at its first
        lowercase appearance or is skipped — same skip the reference's
        indexOf-of-lowercased-word has;
      * each distinct surface is highlighted once (the reference
        re-scans duplicates and nests <b> tags around the same span).
    """
    if not text:
        return ""
    content = text.replace("\n", " ")
    qset = set(query_lemmas)
    # wordsFoundOnPage (LemmaMapper.getListOfWordsWithBaseForms):
    # distinct hit surfaces in first-appearance order
    found: list[str] = []
    seen: set[str] = set()
    for tok in tokenize(content):
        if tok in seen:
            continue
        seen.add(tok)
        if set(lemmatize_token(tok)) & qset:
            found.append(tok)
    # wordPositions (SnippetMapper.java:95-106): first occurrence only
    positions = [(content.find(w), w) for w in found]
    positions = [(p, w) for p, w in positions if p != -1]
    if not positions:
        return ""
    intervals = []
    for pos, w in positions:
        lo = _snippet_border(content, pos if pos == 0 else pos - 1,
                             radius, right=False)
        hi = _snippet_border(content, pos + len(w), radius, right=True)
        intervals.append((lo, hi))
    # squashCollisions (SnippetMapper.java:47-63): merge while any
    # endpoint of one interval falls inside another (inclusive)
    intervals.sort()
    merged: list[list[int]] = []
    for lo, hi in intervals:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    snippets = " <...> ".join(
        f"... {content[lo:hi]} ..." for lo, hi in merged
    )
    for w in found:
        at = snippets.find(w)
        if at != -1:
            snippets = snippets[:at] + "<b>" + w + "</b>" + snippets[at + len(w):]
    return snippets
