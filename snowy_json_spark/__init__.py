"""snowy-json-spark: a PySpark-native schema + constraint validation engine.

Public API:

- :func:`snowy_json_spark.plans.compiler.compile_spec` — compile a
  declarative constraint spec (JSON-Schema keyword surface, SURVEY.md §2)
  against a DataFrame schema into pure Column plans.
- :mod:`snowy_json_spark.plans.report` — verdicts / violations builders.
- :mod:`snowy_json_spark.operators` — table-scope checks (stats,
  uniqueness, referential, drift) and training-data ops (dedup, ANN,
  text analysis).
- :class:`snowy_json_spark.engine.ValidationEngine` — end-to-end runner.
"""

from .plans.compiler import Compiled, Compiler, Options, SpecError, compile_spec
from .plans.report import partition_verdicts, violations, with_verdict

__all__ = [
    "Compiled",
    "Compiler",
    "Options",
    "SpecError",
    "compile_spec",
    "partition_verdicts",
    "violations",
    "with_verdict",
]

__version__ = "0.1.0"
