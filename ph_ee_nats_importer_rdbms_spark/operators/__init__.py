from ph_ee_nats_importer_rdbms_spark.operators.classify import (  # noqa: F401
    parse_envelope,
    with_routing,
)
from ph_ee_nats_importer_rdbms_spark.operators.pipeline import (  # noqa: F401
    run_import_pipeline,
)
