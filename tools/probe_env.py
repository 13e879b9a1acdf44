"""Re-probe the env-blocked capabilities each round (VERDICT r6 item 7)
and emit a machine-readable artifact so every "env-blocked" claim in
SURVEY.md §8 stays auditable.

Probes (all capabilities the repo gates behind import-try / runtime
fallbacks, with the feature each one would unlock):

- delta-spark      -> live Delta MERGE INTO state backend (state_backend.py)
- google.protobuf  -> live transformWithStateInPandas (streaming.py TWS twin)
- avro / fastavro  -> python-side Avro; plus a LIVE format("avro") round-trip
                      attempt (Spark ships avro core jars for internal use,
                      but the spark-avro DSv2 module is a separate artifact)
- PIL / cv2 / soundfile -> real image/video/audio codecs (ext/multimodal.py
                      env-gate; WAV/BMP/VID0 decode paths are real already)

No installation is attempted: the environment brief forbids pip/apt, so
the probe records importability + a live format probe only.

Usage: python tools/probe_env.py [OUT.json]
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import sys
import time

MODULES = (
    "delta",
    "google.protobuf",
    "avro",
    "fastavro",
    "PIL",
    "cv2",
    "soundfile",
)


def probe() -> dict:
    out: dict = {"generated_unix": int(time.time()), "modules": {}}
    for mod in MODULES:
        try:
            m = importlib.import_module(mod)
            out["modules"][mod] = {
                "available": True,
                "version": getattr(m, "__version__", None),
            }
        except Exception as e:  # noqa: BLE001 - any import failure counts
            out["modules"][mod] = {
                "available": False,
                "error": f"{type(e).__name__}: {e}",
            }

    import pyspark

    out["pyspark_version"] = pyspark.__version__
    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    out["relevant_jars"] = sorted(
        os.path.basename(j)
        for pat in ("*avro*", "*delta*", "*protobuf*")
        for j in glob.glob(os.path.join(jar_dir, pat))
    )

    # live spark-avro probe: core avro jars ship with Spark but the
    # format("avro") DSv2 module (spark-avro_2.13) is a separate artifact
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("probe_env")
        .getOrCreate()
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="probe_avro_")
    try:
        spark.range(3).write.format("avro").save(os.path.join(d, "t"))
        out["spark_avro_format"] = {"available": True}
    except Exception as e:  # noqa: BLE001
        out["spark_avro_format"] = {
            "available": False,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    return out


if __name__ == "__main__":
    artifact = probe()
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    text = json.dumps(artifact, indent=1)
    if dest:
        with open(dest, "w") as f:
            f.write(text + "\n")
        print(f"wrote {dest}")
    print(text)
