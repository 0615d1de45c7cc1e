"""CLI and HTTP surface tests (reference E1-E3 route contract)."""

from __future__ import annotations

import io
import json
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sales_csv_bytes() -> bytes:
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "category": ["a", "a", "b", "b"],
            "price": [10.0, 20.0, 30.0, 40.0],
            "quantity": [1, 2, 3, 4],
        }
    )
    buf = io.StringIO()
    pdf.to_csv(buf, index=False)
    return buf.getvalue().encode()


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    flask = pytest.importorskip("flask")  # noqa: F841
    from ai_duckdb_spark.webapp import create_app

    tmp = tmp_path_factory.mktemp("web")
    app = create_app(upload_folder=str(tmp / "uploads"), db_path=str(tmp / "chat.db"))
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


class TestWebApp:
    def test_index_serves_chat_page(self, client):
        """GET / returns the chat frontend (reference app.py:109-111);
        the page must wire every API route the backend serves."""
        resp = client.get("/")
        assert resp.status_code == 200
        html = resp.get_data(as_text=True)
        assert "<!DOCTYPE html>" in html
        for element in ("dragArea", "fileInput", "questionInput", "newSessionBtn", "chat"):
            assert f'id="{element}"' in html, element
        for route in (
            "/api/upload",
            "/api/ask_question",
            "/api/chat_history",
            "/api/new_session",
            "/api/sessions",
            "/api/files",
            "/api/switch_session/",
        ):
            assert route in html, route

    def test_upload_and_ask(self, client, sales_csv_bytes):
        resp = client.post(
            "/api/upload",
            data={"file": (io.BytesIO(sales_csv_bytes), "sales.csv")},
            content_type="multipart/form-data",
        )
        assert resp.status_code == 200, resp.get_json()
        body = resp.get_json()
        assert body["data_info"]["行数"] == 4
        file_id = body["file_id"]

        resp = client.post(
            "/api/ask_question",
            json={"question": "sum of price by category", "file_id": file_id},
        )
        assert resp.status_code == 200, resp.get_json()
        md = resp.get_json()["markdown_result"]
        assert "数据分析结果" in md and "```sql" in md
        # a=30, b=70 must appear as %.2f cells
        assert "30.00" in md and "70.00" in md

        resp = client.get("/api/chat_history")
        history = resp.get_json()["history"]
        assert len(history) == 1 and history[0]["filename"] == "sales.csv"

        resp = client.get("/api/files")
        assert len(resp.get_json()["files"]) == 1

    def test_upload_rejects_bad_type(self, client):
        resp = client.post(
            "/api/upload",
            data={"file": (io.BytesIO(b"x"), "evil.exe")},
            content_type="multipart/form-data",
        )
        assert resp.status_code == 400

    def test_ask_missing_file(self, client):
        resp = client.post("/api/ask_question", json={"question": "q", "file_id": "nope"})
        assert resp.status_code == 404

    def test_sessions_roundtrip(self, client):
        resp = client.post("/api/new_session")
        sid = resp.get_json()["session_id"]
        assert client.post(f"/api/switch_session/{sid}").status_code == 200
        assert client.post("/api/switch_session/ghost").status_code == 404
        assert any(s["id"] == sid for s in client.get("/api/sessions").get_json()["sessions"])


class TestFrontendJs:
    """Execute the page's ACTUAL inline JavaScript against a live server.

    tests/frontend_driver.mjs fetches `/`, extracts the inline <script>
    verbatim, runs it in a node `vm` under a minimal DOM + cookie-jar
    fetch shim, and fires the same handlers a browser would: file-input
    upload, form submit, Enter-to-send, new-session click, session-list
    switching. Assertions are on what the page's own `md()` renderer put
    into #chat — so the frontend wiring (reference static/js/app.js:
    55-133 upload/ask flow, app.py:109-111 index serving) is covered by
    its real code, not a re-implementation. Caught on first run: a
    date-typed CSV column 500'd /api/upload (datetime not JSON
    serializable — fixed in profile._json_safe) and the upload notice
    read `data_info.row_count` while the backend serves `行数`.
    """

    def test_frontend_js_end_to_end(self, spark, tmp_path):
        import shutil
        import subprocess
        import threading

        node = shutil.which("node")
        if node is None:
            pytest.skip("node runtime not available")
        pytest.importorskip("flask")
        from werkzeug.serving import make_server

        from ai_duckdb_spark.webapp import create_app

        # 200 rows with a DATE column — the shape that crashed upload
        # before profile._json_safe existed
        csv = tmp_path / "orders_sample.csv"
        rows = ["o_orderkey,o_orderstatus,o_totalprice,o_orderdate"]
        rows += [f"{i},{'OF'[i % 2]},{100.0 + i},2024-01-{i % 28 + 1:02d}" for i in range(200)]
        csv.write_text("\n".join(rows) + "\n")

        app = create_app(
            upload_folder=str(tmp_path / "uploads"), db_path=str(tmp_path / "chat.db")
        )
        srv = make_server("127.0.0.1", 0, app, threaded=True)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            driver = os.path.join(os.path.dirname(__file__), "frontend_driver.mjs")
            proc = subprocess.run(
                [node, driver, f"http://127.0.0.1:{srv.server_port}", str(csv)],
                capture_output=True,
                text=True,
                timeout=300,
            )
            verdict = json.loads(proc.stdout.strip().splitlines()[-1])
            assert verdict["pass"], verdict
            assert all(verdict["checks"].values()), verdict["checks"]
        finally:
            srv.shutdown()
            t.join(timeout=10)


class TestCli:
    def test_cli_end_to_end(self, spark, tmp_path, sales_csv_bytes, capsys):
        # reuse the shared test SparkSession (getOrCreate inside run())
        from ai_duckdb_spark.cli import run

        path = tmp_path / "sales.csv"
        path.write_bytes(sales_csv_bytes)
        rc = run(str(path), "sum of price by category")
        out = capsys.readouterr().out
        assert rc == 0
        assert "SQL:" in out and "结果" in out

    def test_cli_missing_file(self, spark, capsys):
        from ai_duckdb_spark.cli import run

        rc = run("/does/not/exist.csv", "q")
        assert rc == 1
        assert "分析失败" in capsys.readouterr().out
