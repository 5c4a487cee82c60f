from .sitegen import build_site, site_config
