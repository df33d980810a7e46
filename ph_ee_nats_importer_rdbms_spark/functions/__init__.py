from ph_ee_nats_importer_rdbms_spark.functions.scalars import (  # noqa: F401
    bool_to_transfer_status,
    epoch_ms_to_ts,
    first_dash_prefix,
    first_dash_suffix,
    iso_to_ts,
    strip_quotes,
    to_money,
    unescape_json,
)
