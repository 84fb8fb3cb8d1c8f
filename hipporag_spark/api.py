"""REST service over the multi-tenant engine (SURVEY §2 row S9).

Reference: ``/root/reference/api_server.py:42-65`` — FastAPI ``/index``
and ``/retrieve`` endpoints on top of ``MultiTenantHippoRAGManager``:
``POST /index {tenant_id, docs: [str]}`` indexes raw document strings
into the tenant's store, ``POST /retrieve {tenant_id, querys: [str]}``
returns the retrieved passage texts per query, both wrapped in a
``{code, msg, data}`` envelope with error codes 1001 (index failure)
and 1002 (retrieve failure).

Re-expressed with the standard library (this sandbox has no
FastAPI/uvicorn): ``ThreadingHTTPServer`` + JSON, same routes, same
field names (including the reference's ``querys`` spelling), same
envelope and error codes.  The service is a THIN driver by design —
the reference's endpoints are 24 lines of dispatch — so every data
operation here is the engine's own DataFrame path:

- documents become one-row-per-string corpus batches
  ``(repo='rest', path=doc/<sha16>.txt, commit=sha, lang='txt',
  content=doc)`` and go through :meth:`HippoIndex.index` (content-hash
  idempotent, O(batch));
- retrieval runs the full batched GraphRetriever flow and maps the
  ranked ``chunk_id``s back to passage texts via the tenant's own
  ``chunks`` table (the reference returns ``QuerySolution.docs``, the
  passage texts, in query order).

Engine calls are serialized with a lock: the Spark driver is shared
state, and the reference service is synchronous per request too.
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .retrieve import RetrievalConfig
from .tenants import MultiTenantManager

__all__ = ["HippoService"]

_CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


class HippoService:
    """``/index`` + ``/retrieve`` REST facade over per-tenant engines."""

    def __init__(self, spark: SparkSession, root: str, max_loaded: int = 600,
                 retrieval_top_k: int = 10):
        self.spark = spark
        self.mgr = MultiTenantManager(spark, root, max_loaded=max_loaded)
        self.top_k = retrieval_top_k
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- engine operations (REST-independent, unit-testable) -----------

    def _docs_df(self, docs: list[str]):
        rows = []
        for d in docs:
            if not isinstance(d, str):
                raise ValueError("docs must be strings")
            h = hashlib.sha256(d.encode("utf-8")).hexdigest()
            rows.append(("rest", f"doc/{h[:16]}.txt", h[:40], "txt", d))
        return self.spark.createDataFrame(rows, _CORPUS_SCHEMA)

    def index_docs(self, tenant_id: str, docs: list[str]) -> dict:
        if not docs:
            return {}
        with self._lock:
            idx = self.mgr.get(tenant_id)
            return idx.index(self._docs_df(docs))

    def retrieve_docs(self, tenant_id: str, querys: list[str]) -> list[list[str]]:
        """Passage texts per query, rank order, query order preserved —
        the reference's ``[r.docs for r in results]`` shape.

        The ``collect()`` below is bounded by ``top_k × len(querys)``
        rows — the size of the HTTP response itself — so it cannot grow
        with corpus size.  Any future bulk/export endpoint must paginate
        (e.g. ``toLocalIterator`` or a sink write) instead of widening
        this collect."""
        if not querys:
            return []
        if not all(isinstance(q, str) for q in querys):
            raise ValueError("querys must be strings")
        with self._lock:
            idx = self.mgr.get(tenant_id)
            r = idx.retriever(RetrievalConfig(
                dim=idx.embed_dim, retrieval_top_k=self.top_k))
            qdf = self.spark.createDataFrame(
                [(f"q{i:06d}", q) for i, q in enumerate(querys)],
                "query_id string, question string")
            ranked = r.retrieve(qdf)
            texts = idx.cat.read("chunks").select(
                F.col("chunk_id").alias("doc_id"), "content")
            rows = (
                ranked.join(texts, "doc_id")
                .select("query_id", "rank", "content")
                .collect()
            )
        out: list[list[tuple[int, str]]] = [[] for _ in querys]
        for row in rows:
            out[int(row["query_id"][1:])].append((row["rank"], row["content"]))
        return [[c for _rk, c in sorted(lst)] for lst in out]

    # -- HTTP plumbing --------------------------------------------------

    def _handler_cls(self):
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _reply(self, status: int, payload: dict):
                body = json.dumps(payload).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(length) or b"{}")
                except Exception as e:  # malformed body
                    self._reply(400, {"code": 1000, "msg": f"bad request: {e}",
                                      "data": {}})
                    return
                if self.path == "/index":
                    try:
                        # type-check BEFORE list(): list("abc") silently
                        # explodes a JSON string into per-char "documents"
                        # that pass per-element validation (ADVICE r4 #2);
                        # the reference's pydantic layer rejects non-lists
                        if not isinstance(req.get("docs"), list):
                            raise ValueError("docs must be a list of strings")
                        counts = svc.index_docs(str(req["tenant_id"]),
                                                list(req["docs"]))
                        self._reply(200, {"code": 0, "msg": "indexed",
                                          "data": {"counts": counts}})
                    except Exception as e:
                        self._reply(200, {"code": 1001,
                                          "msg": f"index failed: {e}",
                                          "data": {}})
                elif self.path == "/retrieve":
                    try:
                        if not isinstance(req.get("querys"), list):
                            raise ValueError("querys must be a list of strings")
                        docs = svc.retrieve_docs(str(req["tenant_id"]),
                                                 list(req["querys"]))
                        self._reply(200, {"code": 0, "msg": "ok",
                                          "data": {"docs": docs}})
                    except Exception as e:
                        self._reply(200, {"code": 1002,
                                          "msg": f"retrieve failed: {e}",
                                          "data": {"docs": []}})
                else:
                    self._reply(404, {"code": 404, "msg": "not found",
                                      "data": {}})

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the bound port
        (``port=0`` picks an ephemeral one — the test device)."""
        if self._httpd is not None:
            raise RuntimeError("already serving")
        self._httpd = ThreadingHTTPServer((host, port), self._handler_cls())
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None

    def __enter__(self) -> "HippoService":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.stop()
        self.mgr.evict_all()
