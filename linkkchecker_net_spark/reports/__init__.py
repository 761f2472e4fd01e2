from linkkchecker_net_spark.reports.reports import (  # noqa: F401
    canonical_report,
    crawl_log,
    description_report,
    failure_count,
    sitemap_report,
    sitemap_xml_locs,
    used_images_path_report,
    used_images_report,
)
from linkkchecker_net_spark.reports.image_validation import validate_images  # noqa: F401
