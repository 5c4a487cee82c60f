"""Pure-Python conformance core (no Ray imports here)."""

from .config import (
    AUTH_BASIC,
    AUTH_NONE,
    Cookie,
    CrawlConfig,
    CrawlOptions,
    from_toml,
    get_max_content_length,
    new_config,
    new_config_with_opts,
    options_from_toml,
)
from .errors import ContentTooLarge, CrawlError, NormalizeError, NotAllowed, TransportError
from .gourl import GoURL, URLError, parse_query, parse_request_uri
from .urls import (
    Link,
    absolute_links_in,
    get_path,
    get_scheme,
    links_in,
    links_in_fast,
    normalize_url,
    path_forbidden,
    scheme_and_host,
)
