"""Remote suite-config download, $ref resolution, and on-disk caching —
the engine's analogue of the reference's dynamic-schema machinery
(SURVEY.md §2.1 S6/S7):

- ``SuiteRefResolver`` ≙ ``JsonSchemaResolver`` (schema_resolver.py:82-163):
  recursively inlines ``$ref`` references across a JSON config tree; refs
  resolve relative to the document they appear in; a dict's ``$ref`` target
  keys override its sibling keys (the reference's ``out_obj.update`` order).
  Supports local paths, ``file://`` and ``http(s)://`` URIs.
- ``HTTPSuiteDownloader`` ≙ ``HTTPSchemaDownloader``
  (schema_downloader.py:82-193): validates the
  ``http(s)://<org>/<project>/schemas/<version>/`` URL structure, fetches a
  named config through a resolver, and caches it under
  ``schemas_remote/<org>/<project>/<version>/<name>`` with skip-if-exists /
  ``overwrite`` semantics, so a URL-configured suite is fetched once and
  reused across runs.
"""

from __future__ import annotations

import json
import os
import re
from copy import deepcopy
from pathlib import Path
from urllib.parse import urljoin
from urllib.request import url2pathname, urlopen


class SuiteRefResolver:
    """Recursive ``$ref`` inliner over JSON suite-config documents."""

    def __init__(self, base_uri: str):
        base_uri = self._to_uri(base_uri)
        if not base_uri.endswith("/"):
            base_uri += "/"
        self.base_uri = base_uri

    @staticmethod
    def _to_uri(s: str) -> str:
        if s.startswith(("http://", "https://", "file://")):
            return s
        return Path(s).absolute().as_uri()

    def _fetch(self, uri: str) -> dict:
        if uri.startswith("file://"):
            with open(url2pathname(uri[len("file://"):]), "r") as f:
                return json.load(f)
        if uri.startswith(("http://", "https://")):
            # exercised end-to-end against a local-socket http.server in
            # tests/test_schema_downloader.py (mirrors reference
            # testsuite/test_schema_downloader.py:60-76, which hits
            # hepdata.net; this sandbox has loopback only)
            with urlopen(uri, timeout=10) as resp:
                return json.loads(resp.read())
        with open(uri, "r") as f:
            return json.load(f)

    def _walk(self, obj, ref: str):
        if isinstance(obj, dict):
            out = {}
            ref_target = None
            for key, val in obj.items():
                if key == "$ref":
                    target_uri = urljoin(ref, val)
                    target = self._fetch_or_raise(target_uri)
                    ref_target = self._walk(target, target_uri)
                elif isinstance(val, (dict, list)):
                    out[key] = self._walk(val, ref)
                else:
                    out[key] = deepcopy(val)
            if ref_target is not None:
                # referenced keys override siblings (reference semantics:
                # schema_resolver.py:112-117 pops $ref then update()s)
                out.update(ref_target)
            return out
        if isinstance(obj, list):
            return [self._walk(v, ref) if isinstance(v, (dict, list)) else v for v in obj]
        return obj

    def _fetch_or_raise(self, uri: str) -> dict:
        try:
            return self._fetch(uri)
        except Exception:
            # byte-matches schema_resolver.py:162-163
            raise FileNotFoundError(f"Unable to find the desired schema {uri}")

    def resolve(self, suite_uri: str) -> dict:
        """Fetch ``suite_uri`` (absolute, or relative to ``base_uri``) and
        return it with every ``$ref`` recursively inlined."""
        if re.match(r"^[a-z][a-z0-9+.-]*://", suite_uri) or os.path.isabs(suite_uri):
            uri = self._to_uri(suite_uri)
        else:
            uri = urljoin(self.base_uri, suite_uri)
        top = self._fetch_or_raise(uri)
        return self._walk(top, uri)


class HTTPSuiteDownloader:
    """Downloads remote suite configs and caches them on disk under
    ``schemas_remote/<org>/<project>/<version>/``."""

    def __init__(self, suites_resolver: SuiteRefResolver, suites_url: str, cache_root: str | None = None):
        if not suites_url.endswith("/"):
            suites_url += "/"
        self.org = None
        self.project = None
        self.version = None
        self.suites_path = None
        self.suites_resolver = suites_resolver
        self.suites_url = suites_url
        self._parse_remote_url(self.suites_url)
        base = cache_root if cache_root is not None else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        self.suites_path = os.path.join(base, "schemas_remote", self.org, self.project, self.version)

    #: ``http(s)://<org>/<project>/schemas/<version>/`` — the reference's URL
    #: contract (schema_downloader.py:110-131), expressed as one regex
    _URL_RE = re.compile(r"^https?://([\w.-]+)/([\w.-]+)/schemas(?:[^/]*)?/(v?\d+\.\d+(?:\.\d+)?)[^/]*/")

    def _parse_remote_url(self, url: str) -> None:
        m = self._URL_RE.match(url)
        if m is None:
            # byte-matches schema_downloader.py:126
            raise ValueError("Invalid remote schemas URL")
        self.org, self.project, self.version = m.group(1), m.group(2), m.group(3)

    def get_suite_spec(self, suite_name: str) -> dict:
        """Download (and $ref-resolve) the named suite config."""
        return self.suites_resolver.resolve(urljoin(self.suites_url, suite_name))

    def get_suite_type(self, suite_name: str) -> str:
        """Fully-qualified type identifier of a remote suite (≙
        ``get_schema_type``, schema_downloader.py:158-166)."""
        return urljoin(self.suites_url, suite_name)

    def save_locally(self, suite_name: str, suite_spec: dict, overwrite: bool = False) -> None:
        """Cache the config at ``<suites_path>/<suite_name>``; an existing
        file is kept unless ``overwrite`` (the skip-if-exists / overwrite
        semantics of schema_downloader.py:168-193)."""
        file_path = Path(self.suites_path) / suite_name
        if file_path.is_file() and not overwrite:
            return
        file_path.parent.mkdir(parents=True, exist_ok=True)
        if not os.access(file_path.parent, os.W_OK):
            raise OSError(f"schema cache folder is not writable: {file_path.parent}")
        file_path.write_text(json.dumps(suite_spec, indent=2))

    def load_cached(self, suite_name: str) -> dict | None:
        """Return the cached config if present (the skip-download path)."""
        file_path = os.path.join(self.suites_path, suite_name)
        if os.path.isfile(file_path):
            with open(file_path, "r") as f:
                return json.load(f)
        return None
