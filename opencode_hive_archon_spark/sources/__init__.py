"""Source/sink surface: format round-trips, partitioned writes, catalogs.

Parquet is the native format (see session.read_table); this package adds the
text/columnar format matrix and write paths. Lakehouse table formats
(Delta/Iceberg/Hudi) need jars not present in this image — their factories
are gated behind import-tries and raise a clear error.
"""

from opencode_hive_archon_spark.sources.io import (
    SPECS,
    read_any,
    source_roundtrip_formats,
    write_any,
)

__all__ = ["read_any", "write_any", "source_roundtrip_formats", "SPECS"]
