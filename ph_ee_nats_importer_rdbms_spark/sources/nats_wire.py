"""Dependency-free NATS client speaking the public wire protocol.

The container has neither a ``nats-server`` binary nor the ``nats-py``
client, so the ``jetstream`` transport of the streaming source
(nats_source.py) stays import-gated. This module closes the gap from the
other side: a minimal, blocking, socket-level client for the documented
NATS text protocol (INFO / CONNECT / PING / PONG / SUB / UNSUB / PUB /
MSG / +OK / -ERR — see the public protocol reference at
docs.nats.io/reference/reference-protocols/nats-protocol) plus the two
JetStream JSON API calls the Spark source actually needs:

- ``$JS.API.STREAM.INFO.<stream>``    -> ``state.last_seq`` / ``first_seq``
  (offset discovery — what ``latestOffset`` polls)
- ``$JS.API.STREAM.MSG.GET.<stream>`` with ``{"seq": n}`` -> one message
  (random access by stream sequence — what ranged partition reads use)
- ``$JS.API.DIRECT.GET.<stream>`` with ``{"seq": n, "batch": k}`` -> up
  to ``k`` raw messages streamed as HMSG frames + a 204 EOB marker (the
  public batched direct-get API, NATS ADR-31) — ONE request per window
  instead of one RPC per message, and payloads arrive raw instead of
  base64-inside-JSON, so a ranged partition read costs the server O(1)
  request parses per window. This is the default ranged-read path; the
  per-sequence MSG.GET pipeline stays as the fallback for streams
  without ``allow_direct``.

Request/reply is the standard core-NATS pattern: subscribe a unique
``_INBOX.*`` subject, publish the request with that inbox as reply-to,
wait for the matching MSG. JetStream's API is plain JSON over this
pattern, so no binary protocol work is needed.

Why this exists (vs nats-py): zero dependencies means the transport runs
inside Spark's Python datasource worker processes with nothing to
install, and the wire framing is simple enough (~150 lines) that owning
it is cheaper than gating on an absent library. The reference consumes
core NATS in-process (NatsConsumer.java:34-35, at-most-once); this
client targets the JetStream durable upgrade of the same subject, same
as the nats-py transport.

Semantics matched to a real ``nats-server``:

- CONNECT advertises ``"headers": true`` when the server's INFO does —
  required by direct get, whose replies are HMSG frames (status line +
  ``Nats-Stream``/``Nats-Subject``/``Nats-Sequence`` headers + raw
  payload). Against a headers-less server the client advertises false
  and direct get raises, which the transport layer treats as "fall back
  to pipelined MSG.GET".
- ``verbose: false`` — no +OK chatter; -ERR still raises.
- MSG payloads are length-framed (``<#bytes>\\r\\n<payload>\\r\\n``),
  read exactly, never split on newlines — payloads may contain any
  bytes.
- STREAM.MSG.GET returns the message body base64-encoded in
  ``message.data``; a missing / purged sequence answers with an
  ``error`` object (code 404, err_code 10037 "no message found") —
  surfaced as :class:`SeqOutOfRange` so callers can distinguish data
  loss from transport failure.

Tested against an in-process protocol double (tests/nats_mini_server.py)
over real TCP sockets, including from the separate Python worker
processes Spark runs datasource reads in.
"""

from __future__ import annotations

import base64
import json
import socket
import uuid

_CRLF = b"\r\n"
_MAX_CONTROL_LINE = 4096


class NatsWireError(RuntimeError):
    """Protocol-level failure (-ERR from the server, framing violation)."""


class SeqOutOfRange(NatsWireError):
    """STREAM.MSG.GET for a sequence the stream no longer (or does not
    yet) hold — JetStream API error 404/10037. At-scale meaning: the
    stream's retention policy purged data a checkpoint still references;
    recovery is a policy decision (skip with accounting, or fail loudly),
    made by the caller, not here."""

    def __init__(self, stream: str, seq: int, api_error: dict) -> None:
        super().__init__(
            f"stream {stream!r} has no message at sequence {seq}: {api_error}"
        )
        self.stream = stream
        self.seq = seq
        self.api_error = api_error


def _parse_url(url: str) -> tuple[str, int]:
    """``nats://host:port`` (scheme optional) -> (host, port)."""
    rest = url.split("://", 1)[-1]
    if "@" in rest:  # user:pass@host — credentials unsupported, strip loudly
        raise NatsWireError("credentials in URL are not supported by the wire client")
    host, _, port = rest.partition(":")
    return host or "127.0.0.1", int(port or 4222)


class NatsWireClient:
    """One blocking connection. Not thread-safe by design — each Spark
    task / planning call opens its own (connections are cheap; the
    protocol handshake is one round trip)."""

    def __init__(self, url: str, timeout: float = 10.0) -> None:
        host, port = _parse_url(url)
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.settimeout(timeout)
        self._buf = b""
        self._sid = 0
        info_line = self._read_line()
        if not info_line.startswith(b"INFO "):
            raise NatsWireError(f"expected INFO, got {info_line[:80]!r}")
        self.server_info = json.loads(info_line[5:])
        self.headers = bool(self.server_info.get("headers"))
        self._send(
            b"CONNECT "
            + json.dumps(
                {
                    "verbose": False,
                    "pedantic": False,
                    "headers": self.headers,
                    # no_responders requires headers; negotiating it is
                    # what makes a request to a responder-less subject
                    # (e.g. DIRECT.GET on a stream without allow_direct)
                    # answer an immediate 503-status message instead of
                    # hanging the requester until the socket timeout
                    "no_responders": self.headers,
                    "lang": "python-wire",
                    "version": "0",
                    "protocol": 1,
                }
            ).encode()
            + _CRLF
            + b"PING"
            + _CRLF
        )
        # drain until the handshake PONG (server may not send anything else)
        while True:
            line = self._read_line()
            if line == b"PONG":
                break
            if line.startswith(b"-ERR"):
                raise NatsWireError(line.decode(errors="replace"))

    # -- framing -------------------------------------------------------------

    def _send(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _fill(self) -> None:
        chunk = self._sock.recv(65536)
        if not chunk:
            raise NatsWireError("connection closed by server")
        self._buf += chunk

    def _read_line(self) -> bytes:
        while _CRLF not in self._buf:
            if len(self._buf) > _MAX_CONTROL_LINE:
                raise NatsWireError("control line too long")
            self._fill()
        line, self._buf = self._buf.split(_CRLF, 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    # -- core ops --------------------------------------------------------------

    def publish(self, subject: str, payload: bytes, reply: str | None = None) -> None:
        head = f"PUB {subject} {reply + ' ' if reply else ''}{len(payload)}"
        self._send(head.encode() + _CRLF + payload + _CRLF)

    def flush(self) -> None:
        """PING round-trip: the server processes a connection's frames in
        order, so the PONG proves every prior ``publish`` was applied."""
        self._send(b"PING" + _CRLF)
        while True:
            line = self._read_line()
            if line == b"PONG":
                return
            if line == b"PING":
                self._send(b"PONG" + _CRLF)
                continue
            if line.startswith(b"-ERR"):
                raise NatsWireError(line.decode(errors="replace"))

    def request(self, subject: str, payload: bytes) -> bytes:
        """Core-NATS request/reply: ephemeral inbox, one reply."""
        self._sid += 1
        sid = str(self._sid)
        inbox = f"_INBOX.{uuid.uuid4().hex}"
        self._send(f"SUB {inbox} {sid}".encode() + _CRLF)
        self.publish(subject, payload, reply=inbox)
        while True:
            line = self._read_line()
            if line.startswith(b"MSG "):
                parts = line.decode().split(" ")
                # MSG <subject> <sid> [reply-to] <#bytes>
                nbytes = int(parts[-1])
                body = self._read_exact(nbytes)
                if self._read_exact(2) != _CRLF:
                    raise NatsWireError("bad MSG trailer")
                if parts[2] == sid:
                    self._send(f"UNSUB {sid}".encode() + _CRLF)
                    return body
                continue  # stale delivery for an earlier, abandoned sid
            if line == b"PING":
                self._send(b"PONG" + _CRLF)
                continue
            if line.startswith(b"-ERR"):
                raise NatsWireError(line.decode(errors="replace"))
            if line in (b"PONG", b"+OK"):
                continue
            if line.startswith(b"HMSG "):
                # CONNECT negotiates headers+no_responders, so a request to
                # a responder-less subject (JetStream down, wrong API name)
                # answers with an HMSG status frame. Consume the full frame
                # (keeping the socket in sync) and surface the status as a
                # clean diagnostic naming the subject — not "unexpected
                # frame". A payload-carrying HMSG for our sid is a real
                # (headers) reply: return its payload like a MSG.
                hparts = line.decode().split(" ")
                _subj, headers, payload = self._read_hmsg(hparts)
                if hparts[2] != sid:
                    continue  # stale delivery for an abandoned sid
                status = headers.get("", "")
                if " 503" in status:
                    raise NatsWireError(
                        f"no responders for {subject} (status {status!r})"
                    )
                if payload:
                    self._send(f"UNSUB {sid}".encode() + _CRLF)
                    return payload
                raise NatsWireError(
                    f"status reply for {subject}: {status!r}"
                )
            raise NatsWireError(f"unexpected frame {line[:80]!r}")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "NatsWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- JetStream API ---------------------------------------------------------

    def _js(self, subject: str, req: dict | None) -> dict:
        body = json.dumps(req).encode() if req is not None else b""
        resp = json.loads(self.request(subject, body))
        return resp

    def stream_info(self, stream: str) -> dict:
        resp = self._js(f"$JS.API.STREAM.INFO.{stream}", None)
        if "error" in resp:
            raise NatsWireError(f"STREAM.INFO.{stream}: {resp['error']}")
        return resp

    def last_seq(self, stream: str) -> int:
        return int(self.stream_info(stream)["state"]["last_seq"])

    def first_seq(self, stream: str) -> int:
        return int(self.stream_info(stream)["state"]["first_seq"])

    def get_msg(self, stream: str, seq: int) -> tuple[str, bytes]:
        """(subject, payload) of the message at stream sequence ``seq``."""
        resp = self._js(f"$JS.API.STREAM.MSG.GET.{stream}", {"seq": seq})
        err = resp.get("error")
        if err:
            if int(err.get("code", 0)) == 404:
                raise SeqOutOfRange(stream, seq, err)
            raise NatsWireError(f"MSG.GET.{stream} seq={seq}: {err}")
        msg = resp["message"]
        return msg["subject"], base64.b64decode(msg.get("data") or b"")

    def get_msgs_pipelined(
        self,
        stream: str,
        start: int,
        end: int,
        window: int = 64,
        missing: str = "fail",
    ):
        """Yield ``(seq, subject, payload)`` for stream sequences in
        ``(start, end]``, in sequence order, with up to ``window`` MSG.GET
        requests in flight on this one connection.

        The naive ranged read (one :meth:`get_msg` per sequence) pays one
        full network round trip per message — SUB inbox, PUB request, wait,
        UNSUB — which caps a partition's throughput at ``1/RTT`` messages
        per second against any non-local broker. This path instead opens
        ONE wildcard inbox subscription for the whole range and keeps a
        request window outstanding, so the RTT is amortized across
        ``window`` messages and the wire stays full. Replies are matched to
        sequences by a per-request inbox token (``<base>.<k>``), so reply
        reordering — possible against a clustered JetStream API — cannot
        mis-assign payloads; out-of-order arrivals are buffered (bounded by
        ``window``) and emitted in sequence order.

        ``missing="skip"`` drops purged sequences (the gap in the emitted
        ``seq`` column is the data-loss record); the default raises
        :class:`SeqOutOfRange` on the FIRST missing sequence, in order."""
        if missing not in ("fail", "skip"):
            raise ValueError(f"missing must be fail|skip, got {missing!r}")
        seqs = list(range(start + 1, end + 1))
        if not seqs:
            return
        self._sid += 1
        sid = str(self._sid)
        base = f"_INBOX.{uuid.uuid4().hex}"
        self._send(f"SUB {base}.* {sid}".encode() + _CRLF)
        api = f"$JS.API.STREAM.MSG.GET.{stream}"
        pending: dict[str, int] = {}  # inbox token -> seq
        results: dict[int, object] = {}  # seq -> (subject, payload) | SeqOutOfRange
        sent = 0

        def _request_next() -> None:
            nonlocal sent
            seq = seqs[sent]
            token = str(sent)
            pending[token] = seq
            self.publish(
                api, json.dumps({"seq": seq}).encode(), reply=f"{base}.{token}"
            )
            sent += 1

        try:
            while sent < min(window, len(seqs)):
                _request_next()
            for want in seqs:
                while want not in results:
                    line = self._read_line()
                    if line.startswith(b"MSG "):
                        parts = line.decode().split(" ")
                        nbytes = int(parts[-1])
                        body = self._read_exact(nbytes)
                        if self._read_exact(2) != _CRLF:
                            raise NatsWireError("bad MSG trailer")
                        if parts[2] != sid:
                            continue  # stale delivery for an abandoned sid
                        token = parts[1].rsplit(".", 1)[-1]
                        seq = pending.pop(token, None)
                        if seq is None:
                            continue  # duplicate reply
                        resp = json.loads(body)
                        err = resp.get("error")
                        if err:
                            if int(err.get("code", 0)) == 404:
                                results[seq] = SeqOutOfRange(stream, seq, err)
                            else:
                                raise NatsWireError(
                                    f"MSG.GET.{stream} seq={seq}: {err}"
                                )
                        else:
                            m = resp["message"]
                            results[seq] = (
                                m["subject"],
                                base64.b64decode(m.get("data") or b""),
                            )
                        if sent < len(seqs):
                            _request_next()  # keep the window full
                    elif line == b"PING":
                        self._send(b"PONG" + _CRLF)
                    elif line in (b"PONG", b"+OK"):
                        continue
                    elif line.startswith(b"-ERR"):
                        raise NatsWireError(line.decode(errors="replace"))
                    elif line.startswith(b"HMSG "):
                        # headers are negotiated, so a responder-less JS
                        # API (JetStream down) answers each MSG.GET with
                        # an HMSG 503 status frame — consume it (keeping
                        # the socket in sync) and name the API subject
                        # instead of raising "unexpected frame"
                        hparts = line.decode().split(" ")
                        _hs, headers, _hp = self._read_hmsg(hparts)
                        if hparts[2] != sid:
                            continue  # stale delivery for an abandoned sid
                        status = headers.get("", "")
                        if " 503" in status:
                            raise NatsWireError(
                                f"no responders for {api} "
                                f"(status {status!r})"
                            )
                        raise NatsWireError(
                            f"status reply for {api}: {status!r}"
                        )
                    else:
                        raise NatsWireError(f"unexpected frame {line[:80]!r}")
                res = results.pop(want)
                if isinstance(res, SeqOutOfRange):
                    if missing == "fail":
                        raise res
                    continue  # skip: the seq gap IS the accounting
                yield (want, res[0], res[1])
        finally:
            try:
                self._send(f"UNSUB {sid}".encode() + _CRLF)
            except OSError:
                pass  # connection already dead; close() follows anyway

    # -- batched direct get (NATS ADR-31) ---------------------------------------

    def _read_hmsg(self, parts: list[str]) -> tuple[str, dict, bytes]:
        """Finish reading an HMSG whose control line is already split into
        ``parts``: HMSG <subject> <sid> [reply-to] <#hdr> <#total>.
        Returns (subject, headers dict with '' -> status line, payload)."""
        hdr_len, total_len = int(parts[-2]), int(parts[-1])
        block = self._read_exact(total_len)
        if self._read_exact(2) != _CRLF:
            raise NatsWireError("bad HMSG trailer")
        head, payload = block[:hdr_len], block[hdr_len:]
        headers: dict[str, str] = {}
        lines = head.split(_CRLF)
        # first line is the version/status: "NATS/1.0" or "NATS/1.0 204 EOB"
        headers[""] = lines[0].decode(errors="replace")
        for ln in lines[1:]:
            if not ln:
                continue
            k, _, v = ln.decode(errors="replace").partition(":")
            headers[k.strip()] = v.strip()
        return parts[1], headers, payload

    def direct_get_batch(
        self,
        stream: str,
        start: int,
        end: int,
        window: int = 256,
        missing: str = "fail",
    ):
        """Yield ``(seq, subject, payload)`` for stream sequences in
        ``(start, end]``, in order, via the batched direct-get API — the
        ranged-read shape that amortizes the server's request processing
        across ``window`` messages: one ``$JS.API.DIRECT.GET.<stream>``
        request with ``{"seq": n, "batch": k}`` answers with up to ``k``
        HMSG frames carrying RAW payloads (no per-message base64/JSON),
        terminated by a ``NATS/1.0 204`` EOB status. Requires the stream
        to allow direct get; servers without it answer a 404/503 status
        or an API error BEFORE any message, which callers use to fall
        back to :meth:`get_msgs_pipelined`.

        A real server serves the first message with sequence >= the
        requested one, so retention holes surface as sequence JUMPS:
        ``missing="fail"`` raises :class:`SeqOutOfRange` at the first
        gap inside the requested range; ``missing="skip"`` emits the
        messages that exist (the ``seq`` gap is the data-loss record,
        same contract as the pipelined path)."""
        if missing not in ("fail", "skip"):
            raise ValueError(f"missing must be fail|skip, got {missing!r}")
        if not self.headers:
            raise NatsWireError(
                "direct get needs header support, which the server does "
                "not advertise"
            )
        want = start + 1
        if want > end:
            return
        self._sid += 1
        sid = str(self._sid)
        inbox = f"_INBOX.{uuid.uuid4().hex}"
        self._send(f"SUB {inbox} {sid}".encode() + _CRLF)
        api = f"$JS.API.DIRECT.GET.{stream}"
        try:
            while want <= end:
                self.publish(
                    api,
                    json.dumps(
                        {"seq": want, "batch": min(window, end - want + 1)}
                    ).encode(),
                    reply=inbox,
                )
                got_any = False
                past_end = False
                eob = False
                # The window is BUFFERED until its EOB arrives (r13,
                # ADVICE): real nats-server 2.2-2.10 supports direct get
                # but ignores the ADR-31 ``batch`` field — it answers ONE
                # message and never sends a 204 EOB, so a streaming yield
                # would hand out that message and then die on the socket
                # timeout MID-STREAM, where the auto transport can no
                # longer fall back (a partial range may already be
                # consumed). Holding each window until its terminator
                # makes a missing-EOB timeout surface BEFORE any message
                # of the window is yielded — for the first window that is
                # before ANY yield, exactly the capability signal
                # ``ranged_get="auto"`` needs to re-read the whole range
                # via MSG.GET. Memory is bounded by ``window`` messages.
                buf: list[tuple[int, str, bytes]] = []
                while not eob:
                    line = self._read_line()
                    if line.startswith(b"HMSG "):
                        parts = line.decode().split(" ")
                        subj, headers, payload = self._read_hmsg(parts)
                        if parts[2] != sid:
                            continue  # stale delivery for an abandoned sid
                        status = headers[""].split(" ")
                        code = status[1] if len(status) > 1 else ""
                        if code == "204":  # EOB: batch served completely
                            eob = True
                            continue
                        if code == "404":  # nothing at/after `want`
                            if missing == "fail":
                                raise SeqOutOfRange(
                                    stream, want, {"code": 404, "status": code}
                                )
                            return
                        if code:  # 503 no-responders, 408 timeout, ...
                            raise NatsWireError(
                                f"DIRECT.GET.{stream}: status {headers['']!r}"
                            )
                        seq = int(headers["Nats-Sequence"])
                        if seq > want and missing == "fail":
                            # retention hole inside the requested range
                            # (seq > end implies seq > want, so a hole
                            # whose successor lies past `end` raises too)
                            raise SeqOutOfRange(
                                stream,
                                want,
                                {"code": 404, "err_code": 10037,
                                 "description": "no message found"},
                            )
                        if seq > end:
                            # over-read past the range (holes shifted the
                            # batch): drop, and stop after this batch —
                            # nothing in (want, end] remains on the stream
                            past_end = True
                            continue
                        got_any = True
                        want = seq + 1
                        buf.append(
                            (seq, headers.get("Nats-Subject", subj), payload)
                        )
                    elif line.startswith(b"MSG "):
                        # a JSON API error (stream without allow_direct)
                        parts = line.decode().split(" ")
                        body = self._read_exact(int(parts[-1]))
                        if self._read_exact(2) != _CRLF:
                            raise NatsWireError("bad MSG trailer")
                        if parts[2] != sid:
                            continue
                        raise NatsWireError(
                            f"DIRECT.GET.{stream}: {body[:200]!r}"
                        )
                    elif line == b"PING":
                        self._send(b"PONG" + _CRLF)
                    elif line in (b"PONG", b"+OK"):
                        continue
                    elif line.startswith(b"-ERR"):
                        raise NatsWireError(line.decode(errors="replace"))
                    else:
                        raise NatsWireError(f"unexpected frame {line[:80]!r}")
                yield from buf  # window complete (EOB seen)
                if past_end:
                    return  # the rest of the range is a retention gap
                if not got_any:
                    # EOB with zero messages: stream has nothing >= want
                    if missing == "fail" and want <= end:
                        raise SeqOutOfRange(
                            stream, want, {"code": 404, "status": "empty batch"}
                        )
                    return
        finally:
            try:
                self._send(f"UNSUB {sid}".encode() + _CRLF)
            except OSError:
                pass


__all__ = [
    "NatsWireClient",
    "NatsWireError",
    "SeqOutOfRange",
]
