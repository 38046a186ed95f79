from .documents import synth_documents, explode_documents
from .features import features_from_lineitem, FEATURES_ORACLE_SQL

__all__ = [
    "synth_documents",
    "explode_documents",
    "features_from_lineitem",
    "FEATURES_ORACLE_SQL",
]
