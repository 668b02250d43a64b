from moca_spark.criteria.dsl import (  # noqa: F401
    CriteriaSpec,
    Work,
    parse_criteria,
    parse_seed_lines,
)
from moca_spark.criteria.stages import apply_criteria, register_filter  # noqa: F401
