from linkkchecker_net_spark.kernels.canonicalize import (  # noqa: F401
    canonicalize,
    canonicalize_udf,
    host_of,
    split_host,
)
from linkkchecker_net_spark.kernels.classify import classification_expr  # noqa: F401
from linkkchecker_net_spark.kernels.cssparse import (  # noqa: F401
    extract_css_urls,
    extract_css_urls_udf,
)
from linkkchecker_net_spark.kernels.htmlparse import parse_page, parse_page_udf  # noqa: F401
