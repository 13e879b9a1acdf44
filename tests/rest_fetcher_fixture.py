"""Executor-importable fetch function for rest_datasource live-REST tests.

Shipped to python workers via ``sparkContext.addPyFile`` — simulates the
reference's paginated incremental endpoint (app.js:76-82) from page JSON
files on local disk, so no test touches a network.
"""

import glob
import json
import os


def fetch_pages(options: dict, updated_from_ms: int) -> dict:
    """Serve the first page whose max(updatedOnMs) exceeds the cursor, with
    partialResults=True while later pages remain (README.md:205-256 shape)."""
    ts_field = options.get("tsfield", "updatedOnMs")
    pages = sorted(glob.glob(os.path.join(options["pagesdir"], "*.json")))
    for i, page in enumerate(pages):
        with open(page, encoding="utf-8") as fh:
            items = json.load(fh)["items"]
        fresh = [
            it
            for it in items
            if isinstance(it.get(ts_field), int) and it[ts_field] > updated_from_ms
        ]
        if fresh:
            return {"items": fresh, "partialResults": i + 1 < len(pages)}
    return {"items": [], "partialResults": False}


def post_record(options: dict, body: str) -> None:
    """Recording poster for writer tests: appends each batch body to a
    file named by the task-visible 'postlog' option."""
    with open(options["postlog"], "a", encoding="utf-8") as fh:
        fh.write(body + "\n")


def post_fail(options: dict, body: str) -> None:
    """Poster that simulates a non-2xx response: always raises (the
    reference fail-fast contract, app.js:109-111)."""
    raise RuntimeError("simulated non-2xx target response")
