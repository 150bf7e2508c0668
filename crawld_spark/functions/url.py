"""URL canonicalization — the graft's analog of the reference's
``clone_path`` derivation (lowercase-join, /root/reference/crawlers/github.go:482)
and natural-key normalization before seen-probe (crawlers/github.go:374-390).

Rules (deterministic, pure; kept simple enough that an ANSI-SQL oracle can
replicate them exactly — see __spark_entry__.oracle_sql):

  1. strip surrounding whitespace
  2. prepend "http://" when no scheme is present
  3. lowercase scheme and host (userinfo is not supported / stripped never)
  4. strip the fragment ("#...")
  5. drop default ports (":80" for http, ":443" for https)
  6. empty path -> "/"
  7. query string preserved verbatim

Exposed as a scalar Arrow/pandas UDF (input_hint: no per-row Python in the
hot path — the per-row work here is C-level str ops inside one vectorized
batch call).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def canonicalize_one(url: str | None) -> str | None:
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    # 4. fragment first (cheap, independent of structure)
    hash_pos = u.find("#")
    if hash_pos >= 0:
        u = u[:hash_pos]
    # 2./3. scheme
    scheme_end = u.find("://")
    if scheme_end < 0:
        scheme, rest = "http", u
    else:
        scheme, rest = u[:scheme_end].lower(), u[scheme_end + 3:]
    # split host[:port] from path
    slash = rest.find("/")
    if slash < 0:
        hostport, path = rest, ""
    else:
        hostport, path = rest[:slash], rest[slash:]
    hostport = hostport.lower()
    # 5. default port
    dp = _DEFAULT_PORT.get(scheme)
    if dp and hostport.endswith(dp):
        hostport = hostport[: -len(dp)]
    # 6. empty path
    if not path:
        path = "/"
    return f"{scheme}://{hostport}{path}"


def host_of(url: str | None) -> str | None:
    """Host (incl. non-default port) of an already-canonical URL."""
    if url is None:
        return None
    start = url.find("://") + 3
    end = url.find("/", start)
    return url[start:] if end < 0 else url[start:end]


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_one, na_action="ignore")


@pandas_udf(StringType())
def url_host(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore")


def surt_key(url):
    """SURT sort key of an already-CANONICAL url (Column → Column): the
    Common-Crawl / OpenWayback index key form — host labels reversed and
    comma-joined (leading ``www.`` dropped), ``)`` separator, then the
    path with any query-string parameters sorted::

        http://www.example.com/a/b?b=2&a=1  →  com,example)/a/b?a=1&b=2

    Reversed-host keys make one domain's captures (and all its subdomains)
    a contiguous key range — the property the CDX index leans on: a
    range-partitioned sort by this key turns "every capture of *.example.com"
    into a partition-pruned range scan instead of a full-index filter, and
    zone maps prune within files. Pure JVM built-ins (whole-stage codegen,
    no UDF): regexp scheme strip, split/reverse/join for the host,
    sort_array for the query params.
    """
    from pyspark.sql import functions as F

    rest = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://", "")
    slash = F.instr(rest, "/")
    host = F.when(slash > 0, F.substring(rest, F.lit(1), slash - 1)).otherwise(rest)
    path = F.when(slash > 0, F.substr(rest, slash)).otherwise(F.lit("/"))
    host_nw = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host_nw, r"\.")), ",")
    qmark = F.instr(path, "?")
    p = F.when(qmark > 0, F.substring(path, F.lit(1), qmark - 1)).otherwise(path)
    q = F.when(
        qmark > 0,
        F.concat(
            F.lit("?"),
            F.array_join(F.sort_array(F.split(F.substr(path, qmark + 1), "&")), "&"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(rev, F.lit(")"), p, q)


# A conservative built-in subset of multi-label public suffixes (the PSL
# entries a web crawl hits most). Production deployments swap in the full
# Mozilla Public Suffix List through the same parameter — the expression
# shape (literal isin over the small suffix set) is unchanged; at PSL
# scale (~10k entries) switch the membership test to a broadcast join on
# the last-2-label slice (the blocklist_mark shape in operators/urlfilter).
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ac.jp", "ne.jp", "or.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.hk", "com.sg",
    "co.in", "net.in", "org.in", "co.za", "co.kr", "or.kr",
)


def registrable_domain(host, multi_suffixes=DEFAULT_MULTI_SUFFIXES):
    """Registrable domain (pay-level domain) of a canonical lowercase
    host, Column → Column: the last two labels, or the last THREE when
    the last two form a multi-label public suffix (``shop.co.uk`` owns
    ``x.shop.co.uk``, not ``co.uk``). Hosts with ≤2 labels (including a
    host that IS a suffix, and dotless hosts) return themselves — the
    caller-safe contract for grouping.

    This is the grain politeness budgets and host reputation want at
    10^8 hosts: one operator (``blog.example.com`` + ``www.example.com``
    + ``shop.example.com``) is one budget bucket, not three. Pure
    codegen: split/slice/array_join plus a literal ``isin`` over the
    small suffix set — no UDF, no join, no shuffle.
    """
    from pyspark.sql import functions as F

    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return (
        F.when(n <= 2, h)
        .when(last2.isin(*multi_suffixes), last3)
        .otherwise(last2)
    )
