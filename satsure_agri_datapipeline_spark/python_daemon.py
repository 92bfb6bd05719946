"""PySpark worker daemon with heavy imports PRE-LOADED.

Spark's Python daemon forks a worker process per concurrent task; each
FRESH fork that runs a pandas_udf then pays the numpy + pandas + pyarrow
import cost inside the task (~0.3-0.8 s on this box — measured as the
straggler batch that set the wall time of every Arrow-UDF stage: median
batch 11 ms, cold-worker batch 770 ms). Importing those modules in the
daemon BEFORE it forks moves the cost to one-time daemon startup; every
forked worker inherits the warm modules via copy-on-write.

Wire-up (session.py): ``spark.python.daemon.module`` points here, and the
package directory rides PYTHONPATH so the daemon subprocess can import it.
This is standard practice for production PySpark deployments with
Arrow-UDF-heavy workloads; it changes no semantics, only fork-time cost.
"""

import faulthandler  # noqa: F401  (parity with pyspark.daemon's env toggle)

# Preload the Arrow-UDF hot-path dependencies pre-fork (order: numpy first,
# pandas pulls it in anyway; pyarrow last, optional by design).
import hashlib  # noqa: F401
import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # pragma: no cover - pyarrow is present in every supported env
    import pyarrow  # noqa: F401
    import pyarrow.parquet  # noqa: F401
except ImportError:
    pass

from pyspark import daemon

if __name__ == "__main__":
    daemon.manager()
