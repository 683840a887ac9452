"""Real ORC wire-format reader: postscript/footer protobuf walk, stripe
streams, column decode through the shared kernels. Proves the engine's
codecs against actual ORC byte streams (the reference's golden files and
Spark-written ORC), not just self-round-trips."""

from orc_rs_spark.orcfile.errors import (  # noqa: F401
    OrcBoundsError,
    OrcError,
    OrcFormatError,
    OrcUnsupportedError,
)
from orc_rs_spark.orcfile.reader import (  # noqa: F401
    FileSource,
    MemorySource,
    OrcFileReader,
    read_tail,
)
