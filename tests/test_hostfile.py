"""Host alias file + DD-from-URL: the two reference surface gaps closed in
round 2 (wstlr/hostfile.py:1-64; wstlr/dd/loader.py:51-65). Exit behavior
mirrors reference tests/test_hostfile.py:7-42."""

import pytest

from ncpi_whistler_spark.sources.hostfile import load_hosts_file, resolve_host


class TestLoadHostsFile:
    def test_parses_an_existing_yaml_file(self, tmp_path):
        hosts_file = tmp_path / "fhir_hosts"
        hosts_file.write_text(
            "dev:\n"
            "  host_desc: Dev\n"
            "  target_service_url: http://example.org/fhir\n"
            "  auth_type: auth_basic\n"
        )

        config = load_hosts_file(hosts_file)

        assert config == {
            "dev": {
                "host_desc": "Dev",
                "target_service_url": "http://example.org/fhir",
                "auth_type": "auth_basic",
            }
        }

    def test_missing_file_writes_example_config_and_exits(self, tmp_path, capsys):
        missing_file = tmp_path / "does-not-exist"

        with pytest.raises(SystemExit) as excinfo:
            load_hosts_file(missing_file)

        assert excinfo.value.code == 1
        captured = capsys.readouterr()
        assert "must exist in cwd" in captured.err
        assert "Example Hosts Configuration" in captured.out

    def test_empty_file_is_treated_as_missing(self, tmp_path):
        empty_file = tmp_path / "fhir_hosts"
        empty_file.write_text("")

        with pytest.raises(SystemExit):
            load_hosts_file(empty_file)

    def test_resolve_host_unknown_name_lists_known(self, tmp_path):
        hosts_file = tmp_path / "fhir_hosts"
        hosts_file.write_text(
            "dev:\n  target_service_url: http://example.org/fhir\n"
        )
        assert (
            resolve_host("dev", hosts_file)["target_service_url"]
            == "http://example.org/fhir"
        )
        with pytest.raises(KeyError, match="dev"):
            resolve_host("prod", hosts_file)

    def test_fallback_parser_matches_yaml(self, tmp_path):
        from ncpi_whistler_spark.sources.hostfile import _parse_flat_yaml

        text = (
            "# comment\n"
            "dev:\n"
            "  host_desc: Dev\n"
            "  target_service_url: http://example.org/fhir\n"
            "prod:\n"
            "  target_service_url: https://prod/fhir\n"
        )
        assert _parse_flat_yaml(text) == {
            "dev": {
                "host_desc": "Dev",
                "target_service_url": "http://example.org/fhir",
            },
            "prod": {"target_service_url": "https://prod/fhir"},
        }


class TestDdFromUrl:
    @pytest.fixture()
    def dd_server(self):
        import http.server
        import threading

        csv_body = (
            "variable_name,description,data_type,values\n"
            "subject_id,The subject,string,\n"
            'status,Current status,enumeration,"a=Active;i=Inactive"\n'
        )
        json_body = (
            '{"tables": [{"table": "demo", "columns": ['
            '{"variable_name": "subject_id", "data_type": "string"},'
            '{"variable_name": "age", "data_type": "int"}]}]}'
        )

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = csv_body if self.path.endswith(".csv") else json_body
                self.send_response(200)
                self.end_headers()
                self.wfile.write(body.encode())

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def test_dd_csv_from_http_url(self, spark, dd_server):
        from ncpi_whistler_spark.sources.dd import DataDictionary

        dd = DataDictionary.from_csv(spark, f"{dd_server}/dd.csv", "demo")
        assert [v.varname for v in dd.variables] == ["subject_id", "status"]
        assert dd.variables[1].data_type == "enumeration"
        assert dd.variables[1].enumerations == {"a": "Active", "i": "Inactive"}

    def test_dd_json_model_from_http_url(self, dd_server):
        from ncpi_whistler_spark.sources.dd import DataDictionary

        dd = DataDictionary.from_json_path(f"{dd_server}/model.json", "demo")
        assert [v.varname for v in dd.variables] == ["subject_id", "age"]
        assert dd.variables[1].data_type == "int"

    def test_local_path_still_opens(self, tmp_path):
        from ncpi_whistler_spark.sources.dd import open_dd_file

        p = tmp_path / "dd.csv"
        p.write_text("variable_name\nx\n")
        with open_dd_file(str(p)) as fh:
            assert fh.read().startswith("variable_name")


class TestAuthHeader:
    """Host auth blocks thread into the HTTP transport (the reference's
    fhir_hosts files exist mainly to carry auth; silently dropping the
    credentials would 401 on every authenticated host)."""

    def test_no_auth_and_absent(self):
        from ncpi_whistler_spark.sinks.rest import auth_header

        assert auth_header({"auth_type": "no_auth"}) == {}
        assert auth_header({}) == {}

    def test_basic(self):
        import base64

        from ncpi_whistler_spark.sinks.rest import auth_header

        h = auth_header(
            {"auth_type": "auth_basic", "username": "u", "password": "p"}
        )
        assert h == {
            "Authorization": "Basic " + base64.b64encode(b"u:p").decode()
        }

    def test_bearer(self):
        from ncpi_whistler_spark.sinks.rest import auth_header

        assert auth_header({"auth_type": "auth_bearer", "token": "tok"}) == {
            "Authorization": "Bearer tok"
        }

    def test_unknown_raises(self):
        import pytest

        from ncpi_whistler_spark.sinks.rest import auth_header

        with pytest.raises(ValueError, match="auth_kerberos"):
            auth_header({"auth_type": "auth_kerberos"})

    def test_http_transport_sends_header(self):
        """End-to-end: HttpTransport includes the Authorization header on
        the wire (real local HTTP server)."""
        import http.server
        import threading

        from ncpi_whistler_spark.sinks.rest import HttpTransport, auth_header

        seen = {}

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                seen["auth"] = self.headers.get("Authorization")
                self.send_response(200)
                self.send_header("Content-Type", "application/fhir+json")
                self.end_headers()
                self.wfile.write(b'{"id": "x1"}')

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            transport = HttpTransport(
                base_url=f"http://127.0.0.1:{srv.server_port}",
                headers=auth_header({"auth_type": "auth_bearer", "token": "t0k"}),
            )
            res = transport("POST", "Patient", '{"resourceType": "Patient"}')
            assert res.status == 200 and res.fhir_id == "x1"
            assert seen["auth"] == "Bearer t0k"
        finally:
            srv.shutdown()
