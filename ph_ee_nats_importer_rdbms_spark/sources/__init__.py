from ph_ee_nats_importer_rdbms_spark.sources.files import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    register_views,
)
