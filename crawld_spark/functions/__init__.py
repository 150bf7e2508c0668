from crawld_spark.functions.url import canonicalize_one, canonicalize_url, url_host  # noqa: F401
from crawld_spark.functions.extract import (  # noqa: F401
    wrap_html_one,
    extract_text_one,
    extract_links_one,
    extract_text,
    extract_links,
    wrap_html,
)
