"""Remote suite download + on-disk cache + $ref resolution — mirrors the
reference's testsuite/test_schema_downloader.py:60-148 and
test_schema_resolver.py:55-69 over the new engine's suite configs."""

import json
import os

import pytest

from hepdata_validator_ray.sources.schema_downloader import (
    HTTPSuiteDownloader,
    SuiteRefResolver,
)


@pytest.fixture
def served_dir(tmp_path):
    """A local dir standing in for the remote server (the reference patches
    requests.get the same way — its tests never touch the network)."""
    (tmp_path / "real_schema.json").write_text(json.dumps({"field_1": "value_1", "field_2": "value_2"}))
    (tmp_path / "base.json").write_text(
        json.dumps({"name": "base_suite", "version": "1.1.1", "nested": {"$ref": "part.json"}, "kept": 1})
    )
    (tmp_path / "part.json").write_text(json.dumps({"inner": [{"$ref": "leaf.json"}, 7]}))
    (tmp_path / "leaf.json").write_text(json.dumps({"deep": True}))
    return tmp_path


@pytest.fixture
def downloader(served_dir, tmp_path):
    return HTTPSuiteDownloader(
        suites_resolver=SuiteRefResolver(str(served_dir)),
        suites_url="https://testing.com/test-project/schemas/1.0.0",
        cache_root=str(tmp_path / "cache"),
    )


@pytest.mark.parametrize(
    "url",
    [
        "ftp://testing.com/project/schemas/1.0.0",
        "https://testing.com/project/schemas/v1",
        "https://testing.com/schemas/1.0.0",
        "https://testing.com/project/1.0.0",
        "https://testing.com/1.0.0",
    ],
)
def test_downloader_invalid_url(url):
    with pytest.raises(ValueError):
        HTTPSuiteDownloader(suites_resolver=SuiteRefResolver("/tmp"), suites_url=url)


def test_downloader_local_path_layout(downloader, tmp_path):
    assert downloader.suites_path == os.path.join(
        str(tmp_path / "cache"), "schemas_remote", "testing.com", "test-project", "1.0.0"
    )


def test_downloader_get_suite_type(downloader):
    assert downloader.get_suite_type("custom.json") == "https://testing.com/test-project/schemas/1.0.0/custom.json"


def test_downloader_save_and_cache(downloader):
    spec1 = {"key_1": "value_1"}
    spec2 = {"key_1": "new_value"}
    downloader.save_locally("dummy.json", spec1, overwrite=True)
    path = os.path.join(downloader.suites_path, "dummy.json")
    assert os.path.isfile(path)
    # overwrite=False keeps the existing file (reference :60-148 semantics)
    downloader.save_locally("dummy.json", spec2, overwrite=False)
    assert json.load(open(path)) == spec1
    assert downloader.load_cached("dummy.json") == spec1
    # overwrite=True replaces it
    downloader.save_locally("dummy.json", spec2, overwrite=True)
    assert json.load(open(path)) == spec2


def test_resolver_inlines_refs(served_dir):
    res = SuiteRefResolver(str(served_dir)).resolve("base.json")
    assert res == {
        "name": "base_suite",
        "version": "1.1.1",
        "kept": 1,
        "nested": {"inner": [{"deep": True}, 7]},
    }


def test_resolver_missing_schema(served_dir):
    with pytest.raises(FileNotFoundError) as e:
        SuiteRefResolver(str(served_dir)).resolve("missing.json")
    assert str(e.value).startswith("Unable to find the desired schema ")


def test_ref_target_overrides_siblings(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps({"x": 1, "$ref": "b.json"}))
    (tmp_path / "b.json").write_text(json.dumps({"x": 2, "y": 3}))
    res = SuiteRefResolver(str(tmp_path)).resolve("a.json")
    assert res == {"x": 2, "y": 3}  # referenced keys win (reference order)


@pytest.fixture
def http_server(served_dir):
    """A REAL local-socket HTTP server over the served fixtures — closes the
    reference parity gap (testsuite/test_schema_downloader.py:60-76 hits
    hepdata.net; we hit 127.0.0.1, exercising the same urlopen path)."""
    import http.server
    import threading

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(served_dir), **kw)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    t.join(timeout=5)


def test_resolver_real_http_fetch(http_server):
    """$ref resolution across documents fetched over real HTTP: refs inside
    an http-fetched doc resolve relative to ITS url (part.json -> leaf.json
    both travel the socket)."""
    res = SuiteRefResolver(http_server).resolve("base.json")
    assert res == {
        "name": "base_suite",
        "version": "1.1.1",
        "kept": 1,
        "nested": {"inner": [{"deep": True}, 7]},
    }


def test_resolver_real_http_404(http_server):
    with pytest.raises(FileNotFoundError) as e:
        SuiteRefResolver(http_server).resolve("missing.json")
    assert str(e.value) == f"Unable to find the desired schema {http_server}/missing.json"


def test_downloader_real_http_end_to_end(http_server, tmp_path):
    """Reference parity (test_schema_downloader.py:60-76): download a named
    suite through the structured-URL downloader over a live socket, cache
    it, and reload from cache."""
    dl = HTTPSuiteDownloader(
        suites_resolver=SuiteRefResolver(http_server),
        suites_url="https://testing.com/test-project/schemas/1.0.0",
        cache_root=str(tmp_path / "cache"),
    )
    spec = dl.suites_resolver.resolve("real_schema.json")
    assert spec == {"field_1": "value_1", "field_2": "value_2"}
    dl.save_locally("real_schema.json", spec)
    assert dl.load_cached("real_schema.json") == spec


def test_suite_loader_uses_ref_resolution_and_cache(tmp_path):
    """End-to-end: a local suite config whose check list comes from a $ref'd
    fragment loads into a working CheckSuite; a structured remote URL served
    from the cache loads without any network."""
    from hepdata_validator_ray.sources.suite_loader import load_suite_config

    (tmp_path / "frag.json").write_text(json.dumps({"checks": ["doc_id_non_null", "token_id_range"]}))
    (tmp_path / "suite.json").write_text(
        json.dumps({"name": "ref_suite", "version": "1.1.1", "$ref": "frag.json"})
    )
    suite, _ = load_suite_config(str(tmp_path / "suite.json"), register=False)
    assert [c.name for c in suite.checks] == ["doc_id_non_null", "token_id_range"]

    # pre-seed the cache exactly where the downloader will look, then load
    # the URL: the cache hit must satisfy it with zero network
    url = "https://example.org/proj/schemas/2.0.0/cached_suite.json"
    cache_dir = tmp_path / "cache_root"
    dl = HTTPSuiteDownloader(
        SuiteRefResolver(str(tmp_path)),
        "https://example.org/proj/schemas/2.0.0/",
        cache_root=str(cache_dir),
    )
    dl.save_locally(
        "cached_suite.json",
        {"name": "cached_suite", "version": "1.1.1", "checks": ["doc_id_non_null"]},
    )
    suite2, _ = load_suite_config(url, register=False, cache_root=str(cache_dir))
    assert suite2.name == "cached_suite"
    assert [c.name for c in suite2.checks] == ["doc_id_non_null"]
