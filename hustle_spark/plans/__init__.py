from .observe import audit_retention, observed  # noqa: F401
from .scale import (  # noqa: F401
    audit_plan,
    bucketize_table,
    explain_str,
    salted_join,
    scale_configs,
)
