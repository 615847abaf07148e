"""Unit tests for the shared text kernels (extraction Str1, tokenizer
Str2, lemmatization Str3/F3, snippets Str4-Str8)."""

from searchengine_spark.functions import textproc
from searchengine_spark.functions.lemma_dict import LEMMA_DICT


def test_extract_whitespace_rules():
    # reference: mapper/WebpageMapper.java:44-52
    html = b"<html><body>\n<p>a\tb</p>\n<p>c   d</p></body></html>"
    # tags stripped -> "\na\tb\nc   d" -> nl/tab to space -> collapse
    # -> " a b c d" -> strip one leading space
    assert textproc.extract_text(html) == "a b c d"


def test_extract_strips_script_style_comments():
    html = b"<html><style>p{color:red}</style><script>if(1<2){}</script><!-- x -->hi</html>"
    assert textproc.extract_text(html) == "hi"


def test_extract_entities():
    assert textproc.extract_text(b"a&amp;b &lt;c&gt;&nbsp;d") == "a&b <c> d"


def test_extract_none_and_str():
    assert textproc.extract_text(None) is None
    assert textproc.extract_text("<b>x</b>") == "x"


def test_tokenize_hyphens_and_case():
    # reference: mapper/LemmaMapper.java:82-111 (trimmed-token fix applied)
    assert textproc.tokenize("Привет -мир- -- x-y -") == ["привет", "мир", "x-y"]
    assert textproc.tokenize("A.B,C!") == ["a", "b", "c"]
    assert textproc.tokenize("") == []
    assert textproc.tokenize(None) == []


def test_tokenize_ru_mode_drops_latin():
    assert textproc.tokenize("слово word", mode="ru") == ["слово"]


def test_lemmatize_inflection_and_identity():
    assert textproc.lemmatize_token("индексы") == ["индекс"]
    assert textproc.lemmatize_token("sparks") == ["spark"]
    assert textproc.lemmatize_token("qqqq") == ["qqqq"]  # OOV identity


def test_lemmatize_stop_pos_dropped():
    # reference: LemmaMapper.java:13,78-80 (ПРЕДЛ/СОЮЗ/МЕЖД)
    for stop in ["и", "в", "на", "ох"]:
        assert textproc.lemmatize_token(stop) == []


def test_multi_lemma_expansion():
    # reference: LemmaMapper.java:26-36 — one word, several lemmas, all kept
    assert textproc.lemmatize_token("стекла") == ["стекло", "стечь"]
    out = textproc.tokenize_lemmatize("стекла стекла")
    assert out == ["стекло", "стечь", "стекло", "стечь"]


def test_dictionary_shape():
    assert all(isinstance(v, list) and v for v in LEMMA_DICT.values())


def test_snippet_basic():
    text = "a b c индекс d e f g h поиск i j"
    snip = textproc.make_snippet(text, ["индекс"], radius=2)
    assert snip == "b c <b>индекс</b> d e"


def test_snippet_merge_and_multi():
    text = "x индекс y поиск z a b c d e"
    snip = textproc.make_snippet(text, ["индекс", "поиск"], radius=1)
    # hits at 1 and 3, radius 1 -> [0,2] and [2,4] merge -> [0,4]
    assert snip == "x <b>индекс</b> y <b>поиск</b> z"


def test_snippet_no_hit_and_inflected():
    assert textproc.make_snippet("a b c", ["индекс"]) == ""
    # inflected surface form still matches via lemmatization
    assert "<b>индексы</b>" in textproc.make_snippet("про индексы тут", ["индекс"])


# --- equivalence fuzz: the findall fast path must match the reference
# sub+split formulation byte-for-byte on arbitrary input ---------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.functions.textproc import _KEEP_RE, tokenize, tokenize_lemmatize
from searchengine_spark.functions.lemma_dict import LEMMA_DICT, STOP_POS


def _tokenize_reference(text, mode="general"):
    """The original sub+split formulation (reference semantics)."""
    s = _KEEP_RE[mode].sub(" ", text.lower())
    out = []
    for tok in s.split(" "):
        tok = tok.strip("-")
        if tok:
            out.append(tok)
    return out


def _lemmatize_reference(text, mode="general"):
    out = []
    for tok in _tokenize_reference(text, mode):
        pairs = LEMMA_DICT.get(tok)
        if pairs is None:
            out.append(tok)
        else:
            out.extend(lm for lm, pos in pairs if pos not in STOP_POS)
    return out


_ALPHABET = st.characters(
    codec="utf-8", categories=("L", "N", "P", "Z", "S", "C")
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=200))
def test_tokenize_findall_equals_sub_split(s):
    for mode in ("general", "ru"):
        assert tokenize(s, mode) == _tokenize_reference(s, mode)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=200))
def test_tokenize_lemmatize_fused_equals_reference(s):
    assert tokenize_lemmatize(s) == _lemmatize_reference(s)
