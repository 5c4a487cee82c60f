"""Config conformance ported from factory_test.go."""

from datetime import datetime, timezone

import pytest

from brinkray.ref import (
    AUTH_BASIC,
    Cookie,
    CrawlOptions,
    URLError,
    from_toml,
    get_max_content_length,
    new_config,
    new_config_with_opts,
)
from brinkray.ref.config import (
    DEFAULT_IDLE_WORK_CHECK_INTERVAL,
    DEFAULT_MAX_CONTENT_LENGTH,
    DEFAULT_URL_BUFFER_SIZE,
    DEFAULT_WORKER_COUNT,
    UNLIMITED_MAX_CONTENT_LENGTH,
)

# --------------------------------------------------------- factory_test.go:13-72
NEW_CRAWLER_CASES = [
    ("Missing schema", "google.com", "", True),
    ("URL", "https://liferay.com/", "https://liferay.com", False),
    ("URL with path", "https://liferay.com/web/guest/home", "https://liferay.com", False),
]


@pytest.mark.parametrize("name,root,want_root,want_err", NEW_CRAWLER_CASES, ids=[c[0] for c in NEW_CRAWLER_CASES])
def test_new_config(name, root, want_root, want_err):
    if want_err:
        with pytest.raises(URLError):
            new_config(root)
        return
    cfg = new_config(root)
    assert cfg.root_domain == want_root
    assert cfg.opts.max_content_length == DEFAULT_MAX_CONTENT_LENGTH
    assert cfg.opts.url_buffer_size == DEFAULT_URL_BUFFER_SIZE
    assert cfg.opts.worker_count == DEFAULT_WORKER_COUNT
    assert cfg.opts.idle_work_check_interval == DEFAULT_IDLE_WORK_CHECK_INTERVAL
    assert cfg.domain_allowed(want_root)  # root auto-allowed (factory.go:54)


# --------------------------------------------------------- factory_test.go:74-107
def test_new_config_with_empty_opts_equals_defaults():
    base = new_config("https://www.liferay.com")
    cfg = new_config_with_opts(base.root_domain, CrawlOptions())
    assert cfg.root_domain == base.root_domain
    assert cfg.opts.max_content_length == base.opts.max_content_length
    assert cfg.opts.url_buffer_size == base.opts.url_buffer_size
    assert cfg.opts.worker_count == base.opts.worker_count
    assert cfg.opts.idle_work_check_interval == base.opts.idle_work_check_interval
    assert cfg.allowed_domains == base.allowed_domains


# --------------------------------------------------------- factory_test.go:109-129
@pytest.mark.parametrize(
    "max_cl,want",
    [
        (0, DEFAULT_MAX_CONTENT_LENGTH),
        (-1, UNLIMITED_MAX_CONTENT_LENGTH),
        (512000, 512000),
    ],
    ids=["Default", "Unlimited", "Some value"],
)
def test_get_max_content_length(max_cl, want):
    assert get_max_content_length(max_cl) == want


# --------------------------------------------------------- factory_test.go:131-242
TOML_FIXTURE = """auth-type = 1
user = "testUser"
pass = "testPassword"
url-buffer-size = 5000
worker-count = 2
max-content-length = 10000
entrypoint = "http://example.com"
allowed-domains = ["http://www.example.com"]
ignore-get-parameters = ["redirect"]
fuzzy-get-parameter-checks = true
idle-work-check-interval = 2000
[[cookies]]
Name = "Cookie Name"
Value = "Cookie Value"
Path = "/"
Domain = "http://example.com"
Expires = 2018-12-31T22:59:59Z
RawExpires = ""
MaxAge = 0
Secure = true
HttpOnly = false
Raw = ""

[[cookies]]
Name = "Second Cookie Name"
Value = "Second Cookie Value"
Path = "/"
Domain = "http://example.com"
Expires = 2018-12-31T22:59:59Z
RawExpires = ""
MaxAge = 0
Secure = true
HttpOnly = false
Raw = ""
[headers]
header-name = "header-value"
"""


def test_from_toml_roundtrip(tmp_path):
    p = tmp_path / "brink.toml"
    p.write_text(TOML_FIXTURE)
    cfg = from_toml(str(p))

    date = datetime(2018, 12, 31, 22, 59, 59, tzinfo=timezone.utc)
    want_opts = CrawlOptions(
        auth_type=AUTH_BASIC,
        user="testUser",
        password="testPassword",
        url_buffer_size=5000,
        worker_count=2,
        max_content_length=10000,
        entry_point="http://example.com",
        allowed_domains=["http://www.example.com"],
        ignore_get_parameters=["redirect"],
        fuzzy_get_parameter_checks=True,
        idle_work_check_interval=2000,
        cookies={
            "CookieName": Cookie(
                domain="http://example.com",
                name="CookieName",
                value="Cookie Value",
                path="/",
                expires=date,
                secure=True,
            ),
            "SecondCookieName": Cookie(
                domain="http://example.com",
                name="SecondCookieName",
                value="Second Cookie Value",
                path="/",
                expires=date,
                secure=True,
            ),
        },
        headers={"header-name": "header-value"},
    )
    want = new_config_with_opts(want_opts.entry_point, want_opts)

    # compareCrawlers (factory_test.go:244-304) field list
    assert cfg.root_domain == want.root_domain == "http://example.com"
    assert cfg.opts.entry_point == want.opts.entry_point
    assert cfg.opts.auth_type == want.opts.auth_type
    assert cfg.opts.user == want.opts.user
    assert cfg.opts.password == want.opts.password
    assert cfg.opts.url_buffer_size == want.opts.url_buffer_size
    assert cfg.opts.worker_count == want.opts.worker_count
    assert cfg.opts.max_content_length == want.opts.max_content_length
    assert cfg.opts.allowed_domains == want.opts.allowed_domains
    assert cfg.opts.headers == want.opts.headers
    assert cfg.opts.cookies == want.opts.cookies
    assert cfg.opts.ignore_get_parameters == want.opts.ignore_get_parameters
    assert cfg.opts.fuzzy_get_parameter_checks == want.opts.fuzzy_get_parameter_checks
    assert cfg.opts.idle_work_check_interval == want.opts.idle_work_check_interval

    # engine-significant derived state
    assert cfg.domain_allowed("http://example.com")
    assert cfg.domain_allowed("http://www.example.com")
    assert cfg.ignored_get_params == frozenset({"redirect"})
    assert cfg.req_headers["header-name"] == "header-value"
    # basic auth header (factory.go:186-191): base64("testUser:testPassword")
    assert cfg.req_headers["Authorization"] == "Basic dGVzdFVzZXI6dGVzdFBhc3N3b3Jk"


def test_allowed_domain_normalization():
    """Allowed domains are normalized to scheme://host (factory.go:149-162)."""
    opts = CrawlOptions(allowed_domains=["https://other.com/some/path"])
    cfg = new_config_with_opts("https://root.com/x", opts)
    assert cfg.domain_allowed("https://other.com")
    assert cfg.domain_allowed("https://root.com")
    assert not cfg.domain_allowed("https://other.com/some/path")


def test_allowed_domain_parse_error_raises():
    opts = CrawlOptions(allowed_domains=["no-scheme.com"])
    with pytest.raises(URLError):
        new_config_with_opts("https://root.com", opts)


def test_idle_and_worker_overrides_only_when_positive():
    opts = CrawlOptions(idle_work_check_interval=-5, worker_count=0)
    cfg = new_config_with_opts("https://root.com", opts)
    assert cfg.opts.idle_work_check_interval == DEFAULT_IDLE_WORK_CHECK_INTERVAL
    assert cfg.opts.worker_count == DEFAULT_WORKER_COUNT
