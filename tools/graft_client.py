#!/usr/bin/env python3
"""Pure-stdlib Python client for the graft CatalogServer line protocol —
the consumer-side analogue of the reference's Python bindings
(/root/reference/crates/mate/graph_mate.pyi: load a graph, run an
algorithm, read the per-node result), re-expressed over the daemon's
socket protocol instead of in-process FFI (pyo3/numpy are unresolvable
in this sandbox; the line protocol is the language-neutral surface).

Protocol (see graft.server.CatalogServer): one text command per line;
replies are ``OK ...`` / ``ERR ...`` and, for row-returning commands,
TSV rows terminated by a lone ``.``.

Library use::

    with GraftClient("127.0.0.1", 4632) as c:
        c.create("g", "/path/to/edges.parquet")
        res = c.compute("g", "wcc")      # MutateResult dict:
        #   {"property": "wcc", "iterations": .., "error": ..,
        #    "converged": .., "compute_millis": ..}
        rows = c.get("g", res["property"], limit=10)
        #   -> [(0, 0), (1, 0), ...]

CLI use (one command per invocation)::

    graft_client.py HOST:PORT list
    graft_client.py HOST:PORT props GRAPH
    graft_client.py HOST:PORT create GRAPH PATH [format=..] [layout=..] \
        [orientation=..]
    graft_client.py HOST:PORT remove GRAPH
    graft_client.py HOST:PORT compute GRAPH ALGO
    graft_client.py HOST:PORT to_undirected GRAPH
    graft_client.py HOST:PORT to_relabeled GRAPH
    graft_client.py HOST:PORT get GRAPH PROP [LIMIT]
    graft_client.py HOST:PORT getb GRAPH PROP [LIMIT]

``getb``/``get_arrow`` consume the server's binary Arrow IPC stream
(GETB) — the reference's typed RecordBatch framing — and need pyarrow;
everything else is pure standard library (the same dependency split as
the reference's Python surface: Arrow only on the bulk data plane).
"""
import json
import socket
import sys


class GraftError(RuntimeError):
    """An ERR reply from the server (bad input, unknown graph/algo...)."""


def _typed(field):
    """TSV fields back to int/float/bool where they round-trip cleanly —
    the reading a typed-array consumer (the pyo3 bindings return numpy
    arrays) expects; everything else stays str."""
    for conv in (int, float):
        try:
            return conv(field)
        except ValueError:
            pass
    if field in ("true", "false"):
        return field == "true"
    return field


class GraftClient:
    def __init__(self, host, port, timeout=300.0):
        self._addr = (host, int(port))
        self._timeout = timeout
        self._sock = socket.create_connection((host, int(port)), timeout)
        # buffered text views; writes flush per command
        self._r = self._sock.makefile("r", encoding="utf-8", newline="\n")
        self._w = self._sock.makefile("w", encoding="utf-8", newline="\n")

    # -- protocol plumbing ------------------------------------------------
    def _send(self, *parts):
        self._w.write(" ".join(str(p) for p in parts) + "\n")
        self._w.flush()

    def _status(self):
        """Read one OK/ERR line; raise on ERR; return the OK payload."""
        line = self._r.readline()
        if not line:
            raise GraftError("connection closed by server")
        line = line.rstrip("\n")
        if line.startswith("ERR"):
            raise GraftError(line[3:].strip())
        if not line.startswith("OK"):
            raise GraftError("malformed reply: " + line)
        return line[2:].strip()

    def _body(self):
        """Read lines until the lone '.' terminator."""
        rows = []
        while True:
            line = self._r.readline()
            if not line:
                raise GraftError("connection closed mid-stream")
            line = line.rstrip("\n")
            if line == ".":
                return rows
            rows.append(line)

    # -- commands ----------------------------------------------------------
    def list_graphs(self):
        """One GraphInfo dict per graph — the reference's ListActionResult
        (actions.rs:190-204): graph_name, graph_type, node_count,
        edge_count."""
        self._send("LIST")
        self._status()
        infos = []
        for row in self._body():
            name, gtype, nc, ec = row.split("\t")
            infos.append({"graph_name": name, "graph_type": gtype,
                          "node_count": int(nc), "edge_count": int(ec)})
        return infos

    def props(self, graph):
        self._send("PROPS", graph)
        self._status()
        return self._body()

    def create(self, graph, path, **opts):
        """Register an edge table; returns the reference's
        CreateActionResult struct as a JSON string
        ('{"node_count":..,"edge_count":..,"create_millis":..}').
        Keyword options mirror CreateGraphFromFileConfig
        (actions.rs:110-120): format= parquet (default) / edge_list /
        edge_list_weighted / graph500; layout= sorted / unsorted /
        deduplicated; orientation= directed / undirected."""
        kv = ["%s=%s" % (k, v) for k, v in sorted(opts.items())]
        self._send("CREATE", graph, path, *kv)
        return self._status()

    def remove(self, graph):
        """Drop the graph and its computed properties (the reference's
        remove_graph do_action, server.rs:333-339)."""
        self._send("REMOVE", graph)
        return self._status()

    def compute(self, graph, algo):
        """Run an algorithm server-side; returns the reference's
        MutateResult struct (actions.rs:283-312) as a dict: the stored
        property name plus the per-algo metrics, e.g.
        ``{"property": "sssp_0", "iterations": 4, "error": 0.0,
        "converged": True, "compute_millis": 12}`` (convergence stats
        present for the iterative algorithms). The one scalar algo,
        ``triangle_count``, stores nothing and returns the
        TriangleCountResult struct
        (``{"triangle_count":..,"compute_millis":..}``)."""
        self._send("COMPUTE", graph, algo)
        return json.loads(self._status())

    def to_undirected(self, graph, layout=None):
        """Replace the graph with its undirected form in place (the
        reference's to_undirected do_action; optional CsrLayout applied to
        the merged adjacency); returns the '{"to_undirected_millis":..}'
        timing struct."""
        args = ["TO_UNDIRECTED", graph]
        if layout is not None:
            args.append("layout=%s" % layout)
        self._send(*args)
        return self._status()

    def to_relabeled(self, graph):
        """Replace the graph with its degree-descending relabeled form in
        place (the reference's to_relabeled do_action); returns the
        '{"to_relabeled_millis":..}' timing struct."""
        self._send("TO_RELABELED", graph)
        return self._status()

    def get(self, graph, prop, limit=None):
        """Stream a computed property as a list of typed tuples."""
        args = ["GET", graph, prop] + ([limit] if limit is not None else [])
        self._send(*args)
        self._status()
        return [tuple(_typed(f) for f in row.split("\t"))
                for row in self._body()]

    def get_arrow(self, graph, prop, limit=None):
        """Stream a computed property as typed Arrow record batches and
        return a ``pyarrow.Table``. This is the one OPTIONALLY-pyarrow
        method — exactly the dependency split of the reference's Python
        surface (Arrow for the bulk data plane); the control plane and
        ``get()`` stay pure stdlib. The reader consumes the stream up to
        its IPC end-of-stream marker, after which the connection is in
        line mode again and reusable."""
        try:
            import pyarrow.ipc as pa_ipc
        except ImportError as e:
            raise GraftError(
                "get_arrow requires pyarrow; use get() for TSV") from e
        # dedicated connection per stream (the Flight-client shape): a
        # buffered reader shared between line replies and the binary body
        # could read ahead across the mode switch and lose bytes
        args = ["GETB", graph, prop] + ([limit] if limit is not None else [])
        s = socket.create_connection(self._addr, self._timeout)
        try:
            s.sendall((" ".join(str(p) for p in args) + "\n").encode())
            line = b""
            while not line.endswith(b"\n"):  # unbuffered status line
                c = s.recv(1)
                if not c:
                    raise GraftError("connection closed by server")
                line += c
            status = line.decode("utf-8").rstrip()
            if status.startswith("ERR"):
                raise GraftError(status[3:].strip())
            if status != "OK arrow":
                raise GraftError("malformed reply: " + status)
            # read the stream AND the line-mode "DONE <rows>" trailer from
            # the SAME buffered file object (read-ahead stays coherent).
            # The trailer is the completeness check: a server-side failure
            # at a clean batch boundary yields a well-formed (EOS-marked or
            # EOF-terminated) stream, so only the row count distinguishes
            # complete from truncated.
            f = s.makefile("rb")
            with pa_ipc.open_stream(f) as reader:
                table = reader.read_all()
            done = f.readline().decode("utf-8", "replace").strip()
            if done != "DONE %d" % table.num_rows:
                raise GraftError(
                    "truncated arrow stream: read %d rows, trailer %r"
                    % (table.num_rows, done))
            return table
        finally:
            s.close()

    def quit(self):
        try:
            self._send("QUIT")
            self._r.readline()  # "OK bye"
        except OSError:
            pass

    def close(self):
        self.quit()
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def main(argv):
    if len(argv) < 3:
        sys.stderr.write(__doc__ + "\n")
        return 2
    host, _, port = argv[1].partition(":")
    cmd, args = argv[2], argv[3:]
    with GraftClient(host, port or 4632) as c:
        if cmd == "list":
            for g in c.list_graphs():
                print("%(graph_name)s\t%(graph_type)s\t%(node_count)d\t"
                      "%(edge_count)d" % g)
        elif cmd == "props":
            print("\n".join(c.props(args[0])))
        elif cmd == "create":
            opts = dict(a.split("=", 1) for a in args[2:])
            print(c.create(args[0], args[1], **opts))
        elif cmd == "remove":
            print(c.remove(args[0]))
        elif cmd == "compute":
            print(json.dumps(c.compute(args[0], args[1])))
        elif cmd == "to_undirected":
            print(c.to_undirected(args[0]))
        elif cmd == "to_relabeled":
            print(c.to_relabeled(args[0]))
        elif cmd == "get":
            limit = int(args[2]) if len(args) > 2 else None
            for row in c.get(args[0], args[1], limit):
                print("\t".join(str(v) for v in row))
        elif cmd == "getb":
            limit = int(args[2]) if len(args) > 2 else None
            table = c.get_arrow(args[0], args[1], limit)
            for row in table.to_pylist():
                print("\t".join(str(row[k]) for k in table.column_names))
        else:
            sys.stderr.write("unknown command: %s\n" % cmd)
            return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
