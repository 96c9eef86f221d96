"""HTTP SPARQL endpoint (SPARQL 1.1 Protocol, query operation).

A thin stdlib front door over the Engine: ``GET /sparql?query=…`` and
``POST /sparql`` (urlencoded form or ``application/sparql-query``
body) run through the same planner as ``Engine.sparql``, and the
response is the content-negotiated W3C results document
(sparql/results.py) — JSON by default, XML / CSV / TSV via ``Accept``.
The one-document formats keep their driver-memory row-cap guard: a
result past the cap answers **413** rather than materializing
unbounded output into one HTTP body; malformed queries answer **400**
(the protocol's MalformedQuery), everything else **500**
(QueryRequestRefused).

Deliberately ``http.server``: the endpoint is an integration surface
for standard tooling (curl, rdflib SPARQLStore, notebooks) against a
local or driver-side engine — not a production web stack (no auth, no
TLS, one process). HTTP responses are one document by nature, so
serving is driver-sized by construction; data-sized exports belong to
the distributed CSV/TSV sinks.
"""

from __future__ import annotations

import re
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

# most-specific Accept token wins, first match in header order
_FMT = {
    "application/sparql-results+json": "json",
    "application/json": "json",
    "application/sparql-results+xml": "xml",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
}
_CTYPE = {
    "json": "application/sparql-results+json",
    "xml": "application/sparql-results+xml",
    "csv": "text/csv; charset=utf-8",
    "tsv": "text/tab-separated-values; charset=utf-8",
    "nt": "application/n-triples; charset=utf-8",
}


def _negotiate(accept: str) -> str:
    for tok in (accept or "").split(","):
        fmt = _FMT.get(tok.split(";")[0].strip().lower())
        if fmt:
            return fmt
    return "json"  # the protocol's server-chooses default


def _run_query(
    engine, query: str, fmt: str, limit: int, strict_terms: bool
) -> tuple[str, str]:
    """Execute and serialize: returns (body, format-actually-used).
    ASK has no CSV/TSV document form — those Accepts fall back to the
    JSON boolean document (server-chosen format, per protocol)."""
    from rdfproject_msc_spark.sparql import results as RES

    df = engine.sparql(
        query,
        decode=engine.dictionary is not None,
        strict_terms=strict_terms,
    )
    head = query[: query.find("{")] if "{" in query else query
    if re.search(r"\b(CONSTRUCT|DESCRIBE)\b", head, re.I):
        # CONSTRUCT/DESCRIBE answer an RDF GRAPH, not a results
        # document — serialize the decoded triples as N-Triples
        # (server-chosen format; the engine's canonical term text IS
        # the NT form), under the same one-document row cap
        rows = df.limit(limit + 1).collect()
        if len(rows) > limit:
            raise ValueError(
                f"result exceeds limit={limit} rows — a graph answer "
                "over HTTP is one document; use the engine's "
                "distributed sinks for data-sized graphs"
            )
        body = "".join(f"{r['s']} {r['p']} {r['o']} .\n" for r in rows)
        return body, "nt"
    if df.columns == ["ask"]:
        ans = bool(df.collect()[0]["ask"])
        if fmt == "xml":
            return RES.ask_xml(ans), "xml"
        return RES.ask_json(ans), "json"
    if fmt == "xml":
        return RES.results_xml(df, limit=limit), "xml"
    if fmt == "csv":
        return RES.results_csv(df, limit=limit), "csv"
    if fmt == "tsv":
        return RES.results_tsv(df, limit=limit), "tsv"
    return RES.results_json(df, limit=limit), "json"


def _make_handler(engine, json_limit: int, strict_terms: bool):
    from rdfproject_msc_spark.sparql.parser import SparqlSyntaxError

    class Handler(BaseHTTPRequestHandler):
        server_version = "rdfproject-msc-spark/0.1"

        def log_message(self, *args):  # quiet by default (tests, batch)
            pass

        def _reply(self, code: int, body: str, ctype: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _answer(self, query: str | None) -> None:
            if not query:
                return self._reply(
                    400,
                    "missing 'query' parameter",
                    "text/plain; charset=utf-8",
                )
            fmt = _negotiate(self.headers.get("Accept", ""))
            try:
                body, used = _run_query(
                    engine, query, fmt, json_limit, strict_terms
                )
            except SparqlSyntaxError as e:  # MalformedQuery
                return self._reply(
                    400, f"malformed query: {e}", "text/plain; charset=utf-8"
                )
            except ValueError as e:  # the one-document row-cap guard
                return self._reply(413, str(e), "text/plain; charset=utf-8")
            except Exception as e:  # QueryRequestRefused
                return self._reply(
                    500,
                    f"query evaluation failed: {e}",
                    "text/plain; charset=utf-8",
                )
            self._reply(200, body, _CTYPE[used])

        def do_GET(self):  # noqa: N802 (http.server naming)
            qs = parse_qs(urlparse(self.path).query)
            self._answer((qs.get("query") or [None])[0])

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n).decode("utf-8")
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype.strip().lower() == "application/sparql-query":
                query = raw
            else:  # application/x-www-form-urlencoded (the form default)
                query = (parse_qs(raw).get("query") or [None])[0]
            self._answer(query)

    return Handler


def make_server(
    engine,
    host: str = "127.0.0.1",
    port: int = 0,
    json_limit: int = 10000,
    strict_terms: bool = False,
) -> HTTPServer:
    """Bind (port 0 = ephemeral — read ``server_address[1]``) without
    serving; callers drive ``handle_request()`` / ``serve_forever``.

    ``strict_terms`` defaults to FALSE here — the endpoint is the
    untrusted-query surface, where a constant the graph has never seen
    should answer the spec's EMPTY result, not the engine's typo-guard
    error (which remains the right default for hand-written queries
    through the Python API)."""
    return HTTPServer(
        (host, port), _make_handler(engine, json_limit, strict_terms)
    )


def serve(
    engine,
    host: str = "127.0.0.1",
    port: int = 8898,
    json_limit: int = 10000,
    max_requests: int | None = None,
    strict_terms: bool = False,
) -> None:
    """Serve until interrupted (or for ``max_requests`` requests)."""
    httpd = make_server(engine, host, port, json_limit, strict_terms)
    bound = httpd.server_address
    print(f"SPARQL endpoint listening on http://{bound[0]}:{bound[1]}/sparql")
    try:
        if max_requests is None:
            httpd.serve_forever()
        else:
            for _ in range(max_requests):
                httpd.handle_request()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
