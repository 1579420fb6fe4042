from .queries import QUERIES, entry_query, oracle_sql, queries  # noqa: F401

# Registration side-effect modules: importing them populates QUERIES via the
# @query decorator. Keep AFTER the .queries import (they import from it).
from . import relational_suite  # noqa: E402,F401
from . import llm_extra  # noqa: E402,F401
from . import analytics_extra  # noqa: E402,F401
