"""LocalLake: an in-process DSv2 catalog so MERGE INTO / DELETE WHERE
EXISTS SQL executes for real in environments without an Iceberg/Delta
runtime (see javasrc/locallake/LocalLakeCatalog.java).

:func:`ensure_compiled` compiles the Java source against the bundled
PySpark jars with the JDK's ``javac`` (cached by mtime) and returns the
classes directory to put on ``spark.driver.extraClassPath``;
:func:`register` points a catalog name at the class on a live session.
"""

from __future__ import annotations

import os
import shutil
import subprocess

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "javasrc")
_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "build", "classes")
_JAVA = os.path.join(_SRC, "locallake", "LocalLakeCatalog.java")
_CLASS = os.path.join(_OUT, "locallake", "LocalLakeCatalog.class")

CATALOG_CLASS = "locallake.LocalLakeCatalog"


def _spark_jars_classpath() -> str:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    names = ["spark-sql_", "spark-catalyst_", "spark-sql-api_", "spark-core_",
             "spark-unsafe_", "spark-common-utils_", "scala-library-"]
    picked = [
        os.path.join(jars, f)
        for f in os.listdir(jars)
        if any(f.startswith(n) for n in names)
    ]
    return os.pathsep.join(picked)


def ensure_compiled() -> str | None:
    """Compile LocalLakeCatalog.java if stale; return the classes dir, or
    ``None`` when no JDK compiler is available (catalog tests skip)."""
    if not shutil.which("javac"):
        return None
    if os.path.exists(_CLASS) and os.path.getmtime(_CLASS) >= os.path.getmtime(_JAVA):
        return _OUT
    os.makedirs(_OUT, exist_ok=True)
    subprocess.run(
        [
            "javac",
            "-classpath",
            _spark_jars_classpath(),
            "-d",
            _OUT,
            "-encoding",
            "UTF-8",
            _JAVA,
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    return _OUT


def register(spark, name: str = "locallake") -> None:
    """Point catalog ``name`` at LocalLakeCatalog on a live session (catalog
    configs resolve lazily, so runtime conf is honored on first use).  The
    classes dir must already be on the driver classpath — build_session
    does that when the catalog has been compiled."""
    spark.conf.set(f"spark.sql.catalog.{name}", CATALOG_CLASS)


def clear_all(spark) -> None:
    """Drop every LocalLake table in the JVM (test isolation)."""
    getattr(spark._jvm, CATALOG_CLASS).clearAll()
