"""REST service (SURVEY §2 S9): live round-trip against a real HTTP
server on an ephemeral port, mirroring the reference's
``test_api_server.py`` strategy (api_server.py:42-65 envelope/codes)."""

import json
import urllib.request

from hipporag_spark.api import HippoService


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx still carries the envelope
        return e.code, json.loads(e.read())


def test_rest_index_retrieve_roundtrip(spark, tmp_path):
    with HippoService(spark, str(tmp_path / "svc"), retrieval_top_k=2) as svc:
        port = svc.serve()

        st, r = _post(port, "/index", {
            "tenant_id": "acme",
            "docs": ["alpha rows live in table one",
                     "beta keys join the scan path"],
        })
        assert st == 200 and r["code"] == 0, r
        assert r["data"]["counts"]["chunks"] == 2

        # second tenant, different corpus — isolation via tenant roots
        st, r = _post(port, "/index", {
            "tenant_id": "globex",
            "docs": ["gamma vectors batch the window"],
        })
        assert st == 200 and r["code"] == 0, r

        st, r = _post(port, "/retrieve", {
            "tenant_id": "acme",
            "querys": ["alpha table rows", "beta scan keys"],
        })
        assert st == 200 and r["code"] == 0, r
        docs = r["data"]["docs"]
        assert len(docs) == 2
        assert docs[0] and "alpha" in docs[0][0], docs
        assert docs[1] and "beta" in docs[1][0], docs
        # no cross-tenant leakage: acme never returns globex's doc
        assert all("gamma" not in d for lst in docs for d in lst)

        # reference error envelope: a failing engine call reports code
        # 1002 with HTTP 200, not a transport error
        st, r = _post(port, "/retrieve",
                      {"tenant_id": "acme", "querys": [123]})
        assert st == 200 and r["code"] == 1002, r

        # ADVICE r4 #2: a JSON *string* for docs/querys must be rejected
        # with the 1001/1002 envelope, not exploded into per-char items
        # (list("abc") passes per-element str validation)
        st, r = _post(port, "/index",
                      {"tenant_id": "acme", "docs": "not a list"})
        assert st == 200 and r["code"] == 1001, r
        st, r = _post(port, "/retrieve",
                      {"tenant_id": "acme", "querys": "alpha table"})
        assert st == 200 and r["code"] == 1002, r

        st, r = _post(port, "/nope", {})
        assert st == 404

        # idempotent re-index: content-hash upsert inserts nothing new
        st, r = _post(port, "/index", {
            "tenant_id": "acme",
            "docs": ["alpha rows live in table one"],
        })
        assert st == 200 and r["code"] == 0
        assert r["data"]["counts"]["chunks"] == 0, r
