"""Malformed-HTML tokenizer envelope (SURVEY §7 hard part 1).

The reference drives the raw x/net/html **Tokenizer** over arbitrary
fetched bytes (urls.go:73-106; EOF-is-success at :78-81). x/net/html
documents itself as an implementation of the WHATWG HTML5 tokenization
algorithm, so each case below is pinned to the DOCUMENTED tokenizer
rule it exercises — unclosed tags, bare '<', attribute quirks, raw-text
elements, NUL handling — and ``links_in`` must match that behavior.
The readStartTag quirks Python's HTMLParser lacks are replicated on
_AnchorParser and pinned below: <plaintext> reads to EOF (no literal
</plaintext> ever resumes tokenizing), and rawTag is set BEFORE the
self-closing check, so <script/> still swallows text up to </script.

The hypothesis section fuzzes the never-crashes envelope: LinksIn
returns a (possibly empty) list for ANY byte soup; it never raises.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from brinkray.ref.urls import Link, links_in, links_in_fast


def _hrefs(html: str | bytes, ignore_anchors: bool = False) -> list[str]:
    body = html if isinstance(html, bytes) else html.encode()
    return [l.href for l in links_in("http://t/", body, ignore_anchors)]


# Each row: (html, expected hrefs, the WHATWG/x/net/html rule pinned).
CASES = [
    # -- bare '<' -----------------------------------------------------------
    ("< a href=x>hello", [],
     "data state: '<' + non-letter re-emits '<' as text (no tag open)"),
    ("<3 cool <a href=ok>", ["ok"],
     "'<' + digit is text; the later real anchor still tokenizes"),
    ("<a<b href=x>", [],
     "tag-name state appends '<': tag name is 'a<b', not 'a'"),
    # -- unclosed tags / EOF ------------------------------------------------
    ("<a href=x", [],
     "EOF inside a tag emits no token (ErrorToken; urls.go EOF==success)"),
    ('<a href="x', [],
     "EOF inside a double-quoted attribute value emits no token"),
    ("text <a href=ok> tail <a href=trunc", ["ok"],
     "tokens before the truncated tag still emit"),
    # -- solidus quirks -----------------------------------------------------
    ("<a/href=x>", ["x"],
     "'/' not followed by '>' is unexpected-solidus: reconsumed as "
     "before-attribute-name, so this IS StartTagToken a with href"),
    ("<a href=x/>", ["x/"],
     "'/' inside an UNQUOTED attribute value is a value char: href is "
     "'x/' and the tag is a plain start tag, not self-closing"),
    ('<a href="x"/>', [],
     "'/' after a quoted value makes a SelfClosingTagToken, which the "
     "reference loop (t.Type == StartTagToken) does NOT match"),
    # -- attribute quirks ---------------------------------------------------
    ("<a href>", [""],
     "attribute with no value: Val is the empty string, link emitted"),
    ("<a href=>", [""],
     "missing-attribute-value parse error: empty value, link emitted"),
    ("<a href=1 href=2>", ["2"],
     "the raw Tokenizer keeps duplicate attributes (dedup is the tree "
     "builder's job), and the reference's switch-loop lets the LAST win"),
    ("<A HREF=UpPeR TARGET=_self>", ["UpPeR"],
     "tag/attr names lowercase; values preserve case"),
    ("<a href = 'spaced'>", ["spaced"],
     "whitespace around '=' is consumed"),
    ("<a data-x href=ok misc>", ["ok"],
     "valueless attributes around href are ignored by the switch"),
    ('<a href="x>" q=1>', ["x>"],
     "'>' inside a quoted value does not terminate the tag"),
    ("<a href=a&amp;b>", ["a&b"],
     "character references decode inside attribute values"),
    ("<a href='x'<b>", ["x"],
     "'<' after a quoted value: missing-whitespace parse error, "
     "reconsumed as an attribute name '<b' — href survives"),
    # -- NUL ----------------------------------------------------------------
    ("<a href='a\x00b'>", ["a�b"],
     "U+0000 in an attribute value becomes U+FFFD"),
    ("<a \x00href=q>", [""],
     "U+0000 in before-attribute-name joins the attr name "
     "('�href' != 'href'), so href stays empty but the anchor emits"),
    # -- end tags / comments / bogus comments -------------------------------
    ("</a href=x>", [],
     "EndTagToken never matches the StartTagToken check"),
    ("<!-- <a href=x> -->", [],
     "comment swallows markup"),
    ("<!-- <a href=x>", [],
     "EOF inside a comment: everything stays comment text"),
    ("<?php <a href=x> ?> <a href=ok>", ["ok"],
     "'<?' opens a bogus comment consumed through the first '>'"),
    ("<! junk > <a href=ok>", ["ok"],
     "'<!' (no doctype/comment) opens a bogus comment"),
    # -- raw-text / RCDATA elements (x/net/html tokenizer raw list) ---------
    ("<script>'<a href=x>'</script><a href=ok>", ["ok"],
     "script is raw text"),
    ("<style><a href=x></style><a href=ok>", ["ok"],
     "style is raw text"),
    ("<title><a href=x></title><a href=ok>", ["ok"],
     "title is RCDATA: tags inside are text"),
    ("<textarea><a href=x></textarea><a href=ok>", ["ok"],
     "textarea is RCDATA"),
    ("<iframe><a href=x></iframe><a href=ok>", ["ok"],
     "iframe is raw text in the tokenizer's raw list"),
    ("<noembed><a href=x></noembed><a href=ok>", ["ok"],
     "noembed is raw text"),
    ("<noframes><a href=x></noframes><a href=ok>", ["ok"],
     "noframes is raw text"),
    ("<noscript><a href=x></noscript><a href=ok>", ["ok"],
     "noscript is raw text for the raw Tokenizer"),
    ("<xmp><a href=x></xmp><a href=ok>", ["ok"],
     "xmp is raw text"),
    ("<script><a href=x>", [],
     "unterminated raw text swallows to EOF"),
    # -- reference-specific filters (urls.go:96-101) -------------------------
    ("<a href='javascript:;'>", [],
     "the literal javascript:; href is dropped"),
    ("<a href=' padded '>", ["padded"],
     "href is ASCII-space-trimmed AFTER the filters"),
]


@pytest.mark.parametrize("html,want,rule", CASES,
                         ids=[c[2][:48] for c in CASES])
def test_tokenizer_envelope(html, want, rule):
    assert _hrefs(html) == want, rule


def test_numeric_charref_unescapes_like_go():
    # x/net/html TagAttr unescapes attribute values; an invalid numeric
    # reference (0, surrogates, > 0x10FFFF) becomes U+FFFD per WHATWG —
    # Go's unescapeEntity and Python's html.unescape agree, with or
    # without the trailing semicolon on numeric refs
    assert _hrefs('<a href="&#0">') == ["�"]
    assert _hrefs('<a href="&#97;b">') == ["ab"]
    assert _hrefs('<a href="&#x61">') == ["a"]


def test_plaintext_reads_to_eof():
    # tokenizer.go Next(): rawTag "plaintext" reads everything up to EOF;
    # a literal </plaintext> end tag never resumes tokenizing
    assert _hrefs("<plaintext><a href=x>") == []
    assert _hrefs("<plaintext></plaintext><a href=x>") == []
    assert _hrefs("<a href=before><plaintext><a href=after>") == ["before"]
    # self-closing: rawTag is set BEFORE the '/' check (readStartTag), so
    # <plaintext/> consumes to EOF exactly like <plaintext>
    assert _hrefs("<plaintext/><a href=x></plaintext><a href=y>") == []
    # <plaintext inside another raw-text body is text, not a tag
    assert _hrefs("<script><plaintext></script><a href=ok>") == ["ok"]


def test_selfclosing_rawtag_still_swallows():
    # readStartTag sets rawTag before returning SelfClosingTagToken, so
    # <script/> swallows raw text up to the matching end tag
    assert _hrefs("<script/><a href=x></script><a href=ok>") == ["ok"]
    assert _hrefs("<title/><a href=x></title><a href=ok>") == ["ok"]
    # unterminated self-closing raw tag swallows to EOF (EOF-is-success)
    assert _hrefs("<textarea/><a href=x>") == []


def test_ignore_anchors_filter():
    # urls.go:97: '#'-prefixed hrefs drop only when ignoreAnchors is set,
    # and the check happens BEFORE the space trim
    assert _hrefs("<a href='#frag'>", ignore_anchors=True) == []
    assert _hrefs("<a href='#frag'>", ignore_anchors=False) == ["#frag"]
    assert _hrefs("<a href=' #frag'>", ignore_anchors=True) == ["#frag"]


def test_fast_path_matches_on_adversarial_rawtext():
    """links_in_fast only guarantees equivalence on the engine envelope,
    but its raw-text skip list must cover the same elements."""
    for el in ("script", "style", "title", "textarea", "iframe",
               "noembed", "noframes", "noscript", "xmp"):
        body = f"<{el}><a href=x></{el}><a href=ok>".encode()
        fast = [l.href for l in links_in_fast("http://t/", body, False)]
        assert fast == ["ok"], el
    # plaintext consumes to EOF on the fast path (the Go behavior)
    assert links_in_fast("http://t/", b"<plaintext><a href=x>", False) == []


# --------------------------------------------------------------------------
# fuzz: the never-raises envelope (EOF-is-success for ANY input)
# --------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_links_in_never_raises_on_bytes(body):
    out = links_in("http://t/", body, False)
    assert isinstance(out, list)
    for l in out:
        assert isinstance(l, Link) and isinstance(l.href, str)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<",
                                      blacklist_categories=("Cs",)),
               max_size=200))
def test_no_tags_no_links(text):
    # without '<' the tokenizer can never leave the data state
    assert links_in("http://t/", text.encode(), False) == []


@settings(max_examples=100, deadline=None)
@given(st.lists(
    # no '&': a numeric charref like '&#0' is UNESCAPED by both sides
    # (the WHATWG rule, pinned separately below), so it would not
    # round-trip literally
    st.text(alphabet="abcxyz:/.#?=%20", min_size=1, max_size=20),
    min_size=0, max_size=8,
), st.text(alphabet=st.characters(blacklist_characters="<&",
                                  blacklist_categories=("Cs",)),
           max_size=30))
def test_planted_anchors_survive_junk(hrefs, junk):
    # well-formed anchors interleaved with arbitrary tag-free junk are
    # extracted exactly, in document order
    html = junk.join(f'<a href="{h}">t</a>' for h in hrefs) + junk
    got = _hrefs(html)
    want = [h.strip(" ") for h in hrefs if h != "javascript:;"]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=100))
def test_comment_wrapping_swallows_everything(fragment):
    if "-->" in fragment:
        fragment = fragment.replace("-->", "")
    assert _hrefs("<!--" + fragment + "-->") == []
