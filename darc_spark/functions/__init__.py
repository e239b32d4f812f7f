from darc_spark.functions.canon import (  # noqa: F401
    classify_batch,
    parse_link_udf,
    with_parsed_link,
)
