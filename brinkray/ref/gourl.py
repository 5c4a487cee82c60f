"""Go ``net/url``-compatible URL parsing (the subset brink relies on).

The reference engine keys its whole URL-seen set on strings produced by
Go's ``url.ParseRequestURI`` + ``url.Values`` re-rendering
(reference: urls.go:111-155), so byte-identical conformance requires
reproducing Go's parser — Python's ``urllib.parse`` differs in several
observable ways (fragment splitting, error behavior on missing schemes,
``;`` as a query separator, percent-escape validation).

Semantics transcribed from the public Go standard library sources
(``src/net/url/url.go``, go1.9 era — the version the reference's CI
pins).  Observable contract points:

* ``ParseRequestURI`` never splits fragments: ``#`` stays in the path
  or raw query verbatim.
* missing scheme + not path-absolute => error ("invalid URI for
  request") — reference test urls_test.go:25.
* rootless path after a scheme => *opaque* URL (``mailto:x``): host and
  path are empty.
* query parsing splits on both ``&`` and ``;``; pairs with invalid
  percent-escapes are dropped individually; ``+`` decodes to space.
* percent-escapes must be two hex digits, otherwise the whole parse
  errors (for path) / the pair is dropped (for query).
* the scheme is lower-cased; the host is left verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["GoURL", "URLError", "parse_request_uri", "parse_query"]


class URLError(ValueError):
    """Parse failure — maps to the non-nil error branches in Go."""


@dataclass
class GoURL:
    scheme: str = ""
    opaque: str = ""
    host: str = ""
    path: str = ""
    raw_query: str = ""
    force_query: bool = False
    user: str = ""


_HEX = "0123456789abcdefABCDEF"


def _ishex(c: str) -> bool:
    return c in _HEX


def _unhex(c: str) -> int:
    return int(c, 16)


# Characters valid *unescaped* in a host component (net/url shouldEscape,
# mode encodeHost): RFC 3986 sub-delims plus the legacy extras Go allows.
_HOST_OK = set("!$&'()*+,;=:[]<>\"-._~")


def _unescape(s: str, mode: str) -> str:
    """net/url unescape for modes 'path' | 'host' | 'query'."""
    # Operate on bytes so multi-byte escapes behave like Go strings.
    b = s.encode("utf-8", "surrogateescape")
    out = bytearray()
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x25:  # '%'
            if i + 2 >= n or not _ishex(chr(b[i + 1])) or not _ishex(chr(b[i + 2])):
                raise URLError(f"invalid URL escape {s[i:i+3]!r}")
            if mode == "host" and _unhex(chr(b[i + 1])) < 8 and b[i : i + 3] != b"%25":
                # Go: host %-encoding only for non-ASCII bytes.
                raise URLError(f"invalid URL escape {s[i:i+3]!r}")
            out.append(_unhex(chr(b[i + 1])) << 4 | _unhex(chr(b[i + 2])))
            i += 3
        elif c == 0x2B and mode == "query":  # '+'
            out.append(0x20)
            i += 1
        else:
            if mode == "host" and c < 0x80:
                ch = chr(c)
                if not (ch.isalnum() or ch in _HOST_OK):
                    raise URLError(f"invalid character {ch!r} in host name")
            out.append(c)
            i += 1
    return out.decode("utf-8", "surrogateescape")


def _get_scheme(raw: str) -> tuple[str, str]:
    """Go getscheme: returns (scheme, rest). Empty scheme => rest == raw."""
    for i, ch in enumerate(raw):
        if "a" <= ch <= "z" or "A" <= ch <= "Z":
            continue
        if "0" <= ch <= "9" or ch in "+-.":
            if i == 0:
                return "", raw
            continue
        if ch == ":":
            if i == 0:
                raise URLError("missing protocol scheme")
            return raw[:i], raw[i + 1 :]
        return "", raw
    return "", raw


def _split(s: str, sep: str, cutc: bool) -> tuple[str, str]:
    i = s.find(sep)
    if i < 0:
        return s, ""
    if cutc:
        return s[:i], s[i + len(sep) :]
    return s[:i], s[i:]


def _valid_optional_port(port: str) -> bool:
    if port == "":
        return True
    if not port.startswith(":"):
        return False
    return all("0" <= c <= "9" for c in port[1:])


def _parse_host(host: str) -> str:
    if host.startswith("["):
        i = host.rfind("]")
        if i < 0:
            raise URLError("missing ']' in host")
        colon_port = host[i + 1 :]
        if not _valid_optional_port(colon_port):
            raise URLError(f"invalid port {colon_port!r} after host")
        # (zone identifiers %25... are outside the conformance envelope)
        return host
    i = host.rfind(":")
    if i != -1:
        colon_port = host[i:]
        if not _valid_optional_port(colon_port):
            raise URLError(f"invalid port {colon_port!r} after host")
    return _unescape(host, "host")


def _parse_authority(authority: str) -> tuple[str, str]:
    i = authority.rfind("@")
    if i < 0:
        return "", _parse_host(authority)
    return authority[:i], _parse_host(authority[i + 1 :])


def parse_request_uri(raw: str) -> GoURL:
    """Port of Go ``url.ParseRequestURI`` (viaRequest=true parse)."""
    if raw == "":
        raise URLError("empty url")
    u = GoURL()
    if raw == "*":
        u.path = "*"
        return u

    scheme, rest = _get_scheme(raw)
    u.scheme = scheme.lower()

    if rest.endswith("?") and "?" not in rest[:-1]:
        u.force_query = True
        rest = rest[:-1]
    else:
        rest, u.raw_query = _split(rest, "?", True)

    if not rest.startswith("/"):
        if u.scheme != "":
            u.opaque = rest
            return u
        raise URLError("invalid URI for request")

    if u.scheme != "" and rest.startswith("//"):
        authority, rest = _split(rest[2:], "/", False)
        u.user, u.host = _parse_authority(authority)

    u.path = _unescape(rest, "path")
    return u


def parse_query(raw_query: str) -> dict[str, list[str]]:
    """Port of Go ``url.Values`` parsing as used by ``URL.Query()``.

    ``Query()`` swallows per-pair errors: a pair whose key or value has a
    bad escape is dropped, the rest are kept (url.go ParseQuery).
    Splits on both '&' and ';'.
    """
    out: dict[str, list[str]] = {}
    query = raw_query
    while query != "":
        key = query
        cut = -1
        for j, ch in enumerate(key):
            if ch in "&;":
                cut = j
                break
        if cut >= 0:
            key, query = key[:cut], key[cut + 1 :]
        else:
            query = ""
        if key == "":
            continue
        value = ""
        eq = key.find("=")
        if eq >= 0:
            key, value = key[:eq], key[eq + 1 :]
        try:
            key = _unescape(key, "query")
            value = _unescape(value, "query")
        except URLError:
            continue
        out.setdefault(key, []).append(value)
    return out
