from sql_identity_resolution_spark.functions.normalize import normalize_text  # noqa: F401
from sql_identity_resolution_spark.functions.minhash import minhash_band_keys_udf  # noqa: F401
from sql_identity_resolution_spark.functions.similarity import pair_scorer_udf  # noqa: F401
