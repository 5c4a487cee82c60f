"""Golden conformance tables ported verbatim from the reference's
table-driven tests (urls_test.go). These pin the seen-set key function,
the link extractor, absolutization, and the forbidden-path predicate.
"""

import pytest

from brinkray.ref import (
    Link,
    URLError,
    absolute_links_in,
    links_in,
    links_in_fast,
    normalize_url,
    path_forbidden,
    scheme_and_host,
)

# --------------------------------------------------------------- urls_test.go:9-41
SCHEME_AND_HOST_CASES = [
    ("Valid URL", "https://google.com", "https://google.com", False),
    ("Valid URL w/ port", "https://google.com:80", "https://google.com:80", False),
    ("Valid URL w/ trailing slash", "https://google.com/", "https://google.com", False),
    ("Valid URL w/ paths", "https://google.com/some/path", "https://google.com", False),
    ("Valid URL w/ paths && trailing slash", "https://google.com/some/path/", "https://google.com", False),
    ("Invalid scheme", "https//google.com", "", True),
]


@pytest.mark.parametrize("name,url,want,want_err", SCHEME_AND_HOST_CASES, ids=[c[0] for c in SCHEME_AND_HOST_CASES])
def test_scheme_and_host(name, url, want, want_err):
    if want_err:
        with pytest.raises(URLError):
            scheme_and_host(url)
        return
    scheme, host = scheme_and_host(url)
    assert f"{scheme}://{host}" == want


# --------------------------------------------------------------- urls_test.go:43-87
_T = "<html><header><title>This is title</title></header><body>%s</body></html>"
LINKS_IN_CASES = [
    ("no links no anchors", "https://www.liferay.com", _T % "Hello world", False, []),
    ("no links with anchors", "https://www.liferay.com", _T % "Hello world", True, []),
    (
        "one link with anchors",
        "https://www.liferay.com",
        _T % '<a href="#">Hello world</a>',
        False,
        [Link("https://www.liferay.com", "#")],
    ),
    ("ignore anchor", "https://www.liferay.com", _T % '<a href="#">Hello world</a>', True, []),
    (
        "one link with target blank",
        "https://www.liferay.com",
        _T % '<a href="google.com" target="_blank">Hello world</a>',
        True,
        [Link("https://www.liferay.com", "google.com", "_blank")],
    ),
    (
        "two links with target blank",
        "https://www.liferay.com",
        _T % '<a href="google.com">Hello world</a><a href="liferay.com" target="_blank">Whatsup</a>',
        True,
        [
            Link("https://www.liferay.com", "google.com"),
            Link("https://www.liferay.com", "liferay.com", "_blank"),
        ],
    ),
    (
        "one link with javascript",
        "https://www.liferay.com",
        _T % '<a href="javascript:;">Hello world</a>',
        False,
        [],
    ),
]


@pytest.mark.parametrize("extractor", [links_in, links_in_fast], ids=["exact", "fast"])
@pytest.mark.parametrize("name,url,body,ignore,want", LINKS_IN_CASES, ids=[c[0] for c in LINKS_IN_CASES])
def test_links_in(extractor, name, url, body, ignore, want):
    got = extractor(url, body.encode(), ignore)
    assert got == want
    assert isinstance(got, list)  # empty result is [], not None


# --------------------------------------------------------------- urls_test.go:89-123
NO_IGNORE = frozenset()
IGNORE_SOMETHING = frozenset({"something"})
NORMALIZE_CASES = [
    ("no_get_params", NO_IGNORE, "https://liferay.com", "https://liferay.com"),
    ("one_get_param", NO_IGNORE, "https://liferay.com?test=something", "https://liferay.com?test=something"),
    (
        "two_get_params",
        NO_IGNORE,
        "https://liferay.com?test=justTesting&something=123",
        "https://liferay.com?something=123&test=justTesting",
    ),
    ("one_get_param_no_value", NO_IGNORE, "https://liferay.com?test", "https://liferay.com?test"),
    ("two_get_params_no_value", NO_IGNORE, "https://liferay.com?test&something", "https://liferay.com?something&test"),
    ("one_get_param_not_ignored", IGNORE_SOMETHING, "https://liferay.com?test=something", "https://liferay.com?test=something"),
    ("one_get_param_ignored", IGNORE_SOMETHING, "https://liferay.com?something=test", "https://liferay.com"),
    (
        "two_get_params_none_ignored",
        IGNORE_SOMETHING,
        "https://liferay.com?test=justTesting&shoot=123",
        "https://liferay.com?shoot=123&test=justTesting",
    ),
    (
        "two_get_params_one_ignored",
        IGNORE_SOMETHING,
        "https://liferay.com?test=justTesting&something=123",
        "https://liferay.com?test=justTesting",
    ),
    (
        "two_get_params_both_ignored",
        IGNORE_SOMETHING,
        "https://liferay.com?something=justTesting&something=123",
        "https://liferay.com",
    ),
    ("one_get_param_no_value_not_ignored", IGNORE_SOMETHING, "https://liferay.com?test", "https://liferay.com?test"),
    ("one_get_param_no_value_ignored", IGNORE_SOMETHING, "https://liferay.com?something", "https://liferay.com"),
    ("two_get_params_no_value_one_ignored", IGNORE_SOMETHING, "https://liferay.com?test&something", "https://liferay.com?test"),
]


@pytest.mark.parametrize("name,ignored,url,want", NORMALIZE_CASES, ids=[c[0] for c in NORMALIZE_CASES])
def test_normalize_url(name, ignored, url, want):
    assert normalize_url(url, ignored, fuzzy=False) == want


# --------------------------------------------------------------- urls_test.go:125-185
ABS_CASES = [
    ("no links no anchors", "https://google.com", "https://www.liferay.com", _T % "Hello world", False, []),
    ("no links with anchors", "https://google.com", "https://www.liferay.com", _T % "Hello world", True, []),
    (
        "one link with anchors",
        "https://google.com",
        "https://www.liferay.com",
        _T % '<a href="#">Hello world</a>',
        False,
        [Link("https://www.liferay.com", "#")],
    ),
    ("ignore anchor", "https://google.com", "https://www.liferay.com", _T % '<a href="#">Hello world</a>', True, []),
    (
        "one link with target blank",
        "https://google.com",
        "https://www.liferay.com",
        _T % '<a href="google.com" target="_blank">Hello world</a>',
        True,
        [Link("https://www.liferay.com", "google.com", "_blank")],
    ),
    (
        "two links with target blank",
        "https://google.com",
        "https://www.liferay.com",
        _T % '<a href="google.com">Hello world</a><a href="liferay.com" target="_blank">Whatsup</a>',
        True,
        [
            Link("https://www.liferay.com", "google.com"),
            Link("https://www.liferay.com", "liferay.com", "_blank"),
        ],
    ),
    (
        "one link with javascript",
        "https://google.com",
        "https://www.liferay.com",
        _T % '<a href="javascript:;">Hello world</a>',
        False,
        [],
    ),
    (
        "one dynamic link",
        "https://google.com",
        "https://www.liferay.com",
        _T % '<a href="/hello" target="_blank">Hello world</a>',
        True,
        [Link("https://www.liferay.com", "https://google.com/hello", "_blank")],
    ),
]


@pytest.mark.parametrize("fast", [False, True], ids=["exact", "fast"])
@pytest.mark.parametrize("name,host_url,linked,body,ignore,want", ABS_CASES, ids=[c[0] for c in ABS_CASES])
def test_absolute_links_in(fast, name, host_url, linked, body, ignore, want):
    got = absolute_links_in(host_url, linked, body.encode(), ignore, fast=fast)
    assert got == want


def test_absolute_links_in_protocol_relative_quirk():
    """The ``//`` double-prefix reproduction (urls.go:55-58): a
    protocol-relative href becomes scheme:////host/path."""
    body = (_T % '<a href="//cdn.example.com/x">c</a>').encode()
    got = absolute_links_in("https://google.com", "https://a.com", body, True)
    assert got == [Link("https://a.com", "https:////cdn.example.com/x")]


# --------------------------------------------------------------- urls_test.go:187-212
FORBIDDEN = frozenset({"group/control_panel", "~/control_panel"})
PATH_FORBIDDEN_CASES = [
    ("submatch", "https://www.liferay.com/group/control_panel/something", True),
    ("exact match", "https://www.liferay.com/group/control_panel", True),
    (
        "second match",
        "http://localhost:8080/group/guest/~/control_panel/manage?p_p_id=com_liferay_document_library_web_portlet_DLAdminPortlet&p_p_lifecycle=0&p_p_state=maximized",
        True,
    ),
    ("no match", "https://www.liferay.com/", False),
]


@pytest.mark.parametrize("name,url,want", PATH_FORBIDDEN_CASES, ids=[c[0] for c in PATH_FORBIDDEN_CASES])
def test_path_forbidden(name, url, want):
    assert path_forbidden(url, FORBIDDEN) is want


def test_path_forbidden_parse_failure_is_false():
    assert path_forbidden("not a url", FORBIDDEN) is False


# --------------------------------------------------------------- store/store_test.go:177-231
def test_any_contains_reverse_direction():
    """AnyContainsReverse: a stored key contained in the haystack
    (store/store.go:58-66); golden: 'redirect' inside the portlet param."""
    keys = frozenset({"redirect"})
    haystack = "com_liferay_portal_redirect"
    assert any(k in haystack for k in keys)
    assert not any(haystack in k for k in keys)  # AnyContains direction differs


# --------------------------------------------------------------- engine-specific edges
def test_normalize_opaque_url():
    """mailto:x parses as opaque => empty host+path (Go ParseRequestURI)."""
    assert normalize_url("mailto:someone@example.com") == "mailto://"


def test_normalize_keeps_fragment_verbatim():
    """ParseRequestURI never splits fragments — '#' stays in the path."""
    assert normalize_url("https://h.com/p#frag") == "https://h.com/p#frag"


def test_normalize_trims_whitespace():
    assert normalize_url("  https://h.com/p \n") == "https://h.com/p"


def test_normalize_bare_relative_errors():
    with pytest.raises(URLError):
        normalize_url("page.html")


def test_normalize_sorts_rendered_strings():
    # sort is over the rendered "k=v" strings, not the keys (urls.go:152)
    assert (
        normalize_url("https://h.com/p?b=2&a=10&a=2")
        == "https://h.com/p?a=10&a=2&b=2"
    )


def test_normalize_fuzzy_param_match():
    ignored = frozenset({"redirect"})
    url = "https://h.com/p?com_liferay_portal_redirect=x&keep=1"
    assert normalize_url(url, ignored, fuzzy=True) == "https://h.com/p?keep=1"
    assert (
        normalize_url(url, ignored, fuzzy=False)
        == "https://h.com/p?com_liferay_portal_redirect=x&keep=1"
    )


def test_normalize_quadruple_slash_stable():
    # the //-bug output re-normalizes to itself with an empty host
    assert normalize_url("https:////cdn.example.com/x") == "https:////cdn.example.com/x"


def test_links_in_self_closing_anchor_ignored():
    body = (_T % '<a href="x"/>').encode()
    assert links_in("u", body, True) == []
    assert links_in_fast("u", body, True) == []


def test_links_in_trim_happens_after_anchor_check():
    # " #x" survives anchor filtering because the trim is later (urls.go:101)
    body = (_T % '<a href=" #x">y</a>').encode()
    assert links_in("u", body, True) == [Link("u", "#x")]
    assert links_in_fast("u", body, True) == [Link("u", "#x")]
