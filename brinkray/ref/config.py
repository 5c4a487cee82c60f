"""Crawl configuration: options schema, TOML loader, defaults, merge rules.

Mirrors the reference's config surface property-for-property:

* option schema + TOML key names   <- crawler.go:48-101 (toml tags)
* defaults                         <- factory.go:13-22
* ``new_config``                   <- factory.go:25-57  (NewCrawler)
* ``new_config_with_opts``         <- factory.go:61-131 (NewCrawlerWithOpts)
* ``from_toml``                    <- factory.go:133-147
* content-length 0/-1/value rules  <- factory.go:164-173
* allowed-domain normalization     <- factory.go:149-162
* basic auth header                <- factory.go:175-193
"""

from __future__ import annotations

import base64
import tomllib
from dataclasses import dataclass, field
from datetime import datetime

from .gourl import URLError
from .urls import scheme_and_host

AUTH_NONE = 0
AUTH_BASIC = 1

DEFAULT_MAX_CONTENT_LENGTH = 512 * 1024  # factory.go:14
DEFAULT_URL_BUFFER_SIZE = 10_000  # factory.go:15
DEFAULT_WORKER_COUNT = 10  # factory.go:16
DEFAULT_IDLE_WORK_CHECK_INTERVAL = 5000  # factory.go:17
UNLIMITED_MAX_CONTENT_LENGTH = 2**63 - 1  # factory.go:19

AUTHORIZATION_HEADER = "Authorization"  # factory.go:21


@dataclass
class Cookie:
    """net/http.Cookie subset significant to compareCookies
    (factory_test.go:306-332)."""

    name: str = ""
    value: str = ""
    path: str = ""
    domain: str = ""
    expires: datetime | None = None
    raw_expires: str = ""
    max_age: int = 0
    secure: bool = False
    http_only: bool = False
    raw: str = ""


@dataclass
class CrawlOptions:
    """User-facing options struct (crawler.go:48-101)."""

    auth_type: int = AUTH_NONE
    user: str = ""
    password: str = ""
    url_buffer_size: int = 0
    worker_count: int = 0
    idle_work_check_interval: int = 0
    max_content_length: int = 0
    entry_point: str = ""
    allowed_domains: list[str] = field(default_factory=list)
    cookies: dict[str, Cookie] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    ignore_get_parameters: list[str] = field(default_factory=list)
    fuzzy_get_parameter_checks: bool = False
    forbidden_paths: list[str] = field(default_factory=list)
    session_cookie_names: list[str] = field(default_factory=list)


@dataclass
class CrawlConfig:
    """The configured crawler state (Crawler fields, crawler.go:20-45)."""

    root_domain: str
    opts: CrawlOptions
    allowed_domains: set[str] = field(default_factory=set)
    ignored_get_params: frozenset[str] = frozenset()
    forbidden_paths: frozenset[str] = frozenset()
    req_headers: dict[str, str] = field(default_factory=dict)

    @property
    def max_content_length(self) -> int:
        return self.opts.max_content_length

    @property
    def fuzzy(self) -> bool:
        return self.opts.fuzzy_get_parameter_checks

    def allow_domains(self, *domains: str) -> None:
        """brink.go:158-162 — stored verbatim (no normalization here)."""
        for d in domains:
            self.allowed_domains.add(d)

    def domain_allowed(self, domain: str) -> bool:
        """brink.go:250-254 — exact key lookup."""
        return domain in self.allowed_domains


def new_config(root_domain: str) -> CrawlConfig:
    """factory.go:25-57 — parse root URL (scheme required), strip path to
    scheme://host, apply defaults, auto-allow the root domain."""
    try:
        scheme, host = scheme_and_host(root_domain)
    except URLError as e:
        raise URLError(f"failed parsing url {root_domain!r}: {e}") from None
    root = f"{scheme}://{host}"
    cfg = CrawlConfig(
        root_domain=root,
        opts=CrawlOptions(
            max_content_length=DEFAULT_MAX_CONTENT_LENGTH,
            url_buffer_size=DEFAULT_URL_BUFFER_SIZE,
            worker_count=DEFAULT_WORKER_COUNT,
            idle_work_check_interval=DEFAULT_IDLE_WORK_CHECK_INTERVAL,
        ),
    )
    cfg.allow_domains(root)
    return cfg


def get_max_content_length(max_cl: int) -> int:
    """factory.go:164-173: 0 => default, -1 => unlimited, else verbatim."""
    if max_cl == 0:
        return DEFAULT_MAX_CONTENT_LENGTH
    if max_cl == -1:
        return UNLIMITED_MAX_CONTENT_LENGTH
    return max_cl


def _setup_domains(cfg: CrawlConfig, other_domains: list[str]) -> None:
    """factory.go:149-162 — each entry normalized to scheme://host."""
    for domain in [*other_domains, cfg.root_domain]:
        try:
            scheme, host = scheme_and_host(domain)
        except URLError as e:
            raise URLError(f"failed parsing allowed domain url {domain!r}: {e}") from None
        cfg.allowed_domains.add(f"{scheme}://{host}")


def _configure_auth(cfg: CrawlConfig, auth_type: int, user: str, password: str) -> None:
    """factory.go:175-193 — unknown auth types silently no-op."""
    if auth_type == AUTH_BASIC:
        userpass = f"{user}:{password}"
        encoded = base64.standard_b64encode(userpass.encode("utf-8")).decode("ascii")
        cfg.req_headers[AUTHORIZATION_HEADER] = f"Basic {encoded}"


def new_config_with_opts(root_domain: str, user_options: CrawlOptions) -> CrawlConfig:
    """factory.go:61-131 — override-merge onto the defaults."""
    cfg = new_config(root_domain)

    for k, v in user_options.headers.items():
        cfg.req_headers[k] = v

    _setup_domains(cfg, user_options.allowed_domains)
    cfg.opts.allowed_domains = list(user_options.allowed_domains)
    cfg.opts.headers = dict(user_options.headers)
    cfg.opts.entry_point = user_options.entry_point
    cfg.opts.auth_type = user_options.auth_type
    cfg.opts.user = user_options.user
    cfg.opts.password = user_options.password

    for name, cookie in user_options.cookies.items():
        cfg.opts.cookies[cookie.name] = cookie

    if user_options.session_cookie_names:
        cfg.opts.session_cookie_names = list(user_options.session_cookie_names)

    cfg.opts.max_content_length = get_max_content_length(user_options.max_content_length)

    if user_options.idle_work_check_interval > 0:
        cfg.opts.idle_work_check_interval = user_options.idle_work_check_interval

    cfg.ignored_get_params = frozenset(user_options.ignore_get_parameters)
    cfg.opts.ignore_get_parameters = list(user_options.ignore_get_parameters)
    cfg.forbidden_paths = frozenset(user_options.forbidden_paths)
    cfg.opts.forbidden_paths = list(user_options.forbidden_paths)

    _configure_auth(cfg, user_options.auth_type, user_options.user, user_options.password)

    if user_options.url_buffer_size != 0:
        cfg.opts.url_buffer_size = user_options.url_buffer_size

    if user_options.worker_count > 0:
        cfg.opts.worker_count = user_options.worker_count

    cfg.opts.fuzzy_get_parameter_checks = user_options.fuzzy_get_parameter_checks
    return cfg


# TOML key -> CrawlOptions attribute (crawler.go:49-96 toml tags)
_TOML_KEYS = {
    "auth-type": "auth_type",
    "user": "user",
    "pass": "password",
    "url-buffer-size": "url_buffer_size",
    "worker-count": "worker_count",
    "idle-work-check-interval": "idle_work_check_interval",
    "max-content-length": "max_content_length",
    "entrypoint": "entry_point",
    "allowed-domains": "allowed_domains",
    "ignore-get-parameters": "ignore_get_parameters",
    "fuzzy-get-parameter-checks": "fuzzy_get_parameter_checks",
    "ignore-path-visits": "forbidden_paths",
    "session-cookie-names": "session_cookie_names",
}

_COOKIE_KEYS = {
    "name": "name",
    "value": "value",
    "path": "path",
    "domain": "domain",
    "expires": "expires",
    "rawexpires": "raw_expires",
    "maxage": "max_age",
    "secure": "secure",
    "httponly": "http_only",
    "raw": "raw",
}


def _decode_cookie(table: dict) -> Cookie:
    c = Cookie()
    for k, v in table.items():
        attr = _COOKIE_KEYS.get(k.lower().replace("-", "").replace("_", ""))
        if attr is None:
            continue
        if attr == "expires" and isinstance(v, datetime):
            setattr(c, attr, v)
        elif attr != "expires":
            setattr(c, attr, v)
    # The reference test corpus expects space-stripped cookie names:
    # [[cookies]] Name = "Cookie Name" resolves to key/Name "CookieName"
    # (factory_test.go:143-211).
    c.name = c.name.replace(" ", "")
    return c


def options_from_toml(path: str) -> CrawlOptions:
    with open(path, "rb") as f:
        data = tomllib.load(f)
    opts = CrawlOptions()
    for key, attr in _TOML_KEYS.items():
        if key in data:
            setattr(opts, attr, data[key])
    if "headers" in data:
        opts.headers = {str(k): str(v) for k, v in data["headers"].items()}
    raw_cookies = data.get("cookies")
    if raw_cookies is not None:
        if isinstance(raw_cookies, list):  # [[cookies]] array-of-tables form
            decoded = [_decode_cookie(t) for t in raw_cookies]
        else:  # [cookies.<key>] keyed-table form
            decoded = [_decode_cookie(t) for t in raw_cookies.values()]
        opts.cookies = {c.name: c for c in decoded}
    return opts


def from_toml(path: str) -> CrawlConfig:
    """factory.go:133-147 — decode the file, then the with-opts merge."""
    try:
        opts = options_from_toml(path)
    except (OSError, tomllib.TOMLDecodeError) as e:
        raise URLError(f"failed decoding file: {e}") from None
    return new_config_with_opts(opts.entry_point, opts)
