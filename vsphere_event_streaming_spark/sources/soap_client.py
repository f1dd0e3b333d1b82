"""vCenter SOAP upstream adapter (the real ``ReadNextEvents`` seam).

The reference's collector loop (``/root/reference/cmd/server/main.go:90-125``)
creates an EventHistoryCollector filtered to ``now - VCENTER_STREAM_BEGIN``
and polls ``ReadNextEvents(50)`` once per second. This module is the
engine's equivalent adapter: it speaks the same public VIM SOAP API
(vim25 WSDL operations RetrieveServiceContent → Login →
CreateCollectorForEvents → ReadNextEvents) over stdlib HTTP, is
constructed from the same environment contract the reference documents
(``VCENTER_URL``, ``VCENTER_INSECURE``, ``VCENTER_SECRET_PATH``,
``VCENTER_STREAM_BEGIN`` — reference README.md:160-191), and returns
pages in the exact record shape ``poll_source.SCHEMA_DDL`` declares.

Transport is injectable: the default performs real HTTPS round-trips
and raises ``ConnectionError`` with a clear message when vCenter is
unreachable (this sandbox has no network — the contract test drives
the adapter through a canned-response transport instead, so the
paging/conversion logic carries executed evidence while the wire edge
stays the documented boundary).

Upstream replay note: ``ReadNextEvents`` is forward-only — replay
for restart recovery is the LOG's job (the sink keeps the offset
cursor; reference README.md:27-29), never the collector's. That is
why ``PollStreamReader.readBetweenOffsets`` replays from generator
determinism / the log, not from this adapter.
"""

from __future__ import annotations

import datetime as dt
import os
import ssl
import urllib.error
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from xml.sax.saxutils import escape as _xml_escape
from typing import Callable

#: vim25 namespace of the public VMware Infrastructure Management API.
VIM_NS = "urn:vim25"

_ENVELOPE = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/"'
    ' xmlns:vim25="urn:vim25"><soapenv:Body>{body}</soapenv:Body>'
    "</soapenv:Envelope>"
)

Transport = Callable[[str, bytes], bytes]


def _default_transport(insecure: bool) -> Transport:
    def send(url: str, body: bytes) -> bytes:
        ctx = ssl._create_unverified_context() if insecure else None
        req = urllib.request.Request(
            url,
            data=body,
            headers={
                "Content-Type": "text/xml; charset=utf-8",
                "SOAPAction": "urn:vim25/8.0",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=30, context=ctx) as r:
                return r.read()
        except (urllib.error.URLError, OSError) as e:
            raise ConnectionError(
                f"vCenter unreachable at {url}: {e}"
            ) from e

    return send


@dataclass
class SoapConfig:
    """The reference's documented environment contract."""

    url: str
    username: str
    password: str = field(repr=False, default="")
    insecure: bool = False
    stream_begin: dt.timedelta = dt.timedelta(minutes=5)

    @classmethod
    def from_env(cls, environ: dict | None = None) -> "SoapConfig":
        env = os.environ if environ is None else environ
        url = env.get("VCENTER_URL", "")
        if not url:
            raise ValueError(
                "VCENTER_URL is not set — the SOAP upstream adapter needs "
                "the same environment the reference documents "
                "(VCENTER_URL, VCENTER_SECRET_PATH, VCENTER_INSECURE, "
                "VCENTER_STREAM_BEGIN)"
            )
        secret_path = env.get("VCENTER_SECRET_PATH", "/var/bindings/vsphere")

        def read_secret(name: str) -> str:
            p = os.path.join(secret_path, name)
            try:
                with open(p, encoding="utf-8") as f:
                    return f.read().strip()
            except OSError as e:
                raise ValueError(
                    f"cannot read credential file {p!r} "
                    "(VCENTER_SECRET_PATH must hold 'username' and "
                    "'password' files, per the reference README)"
                ) from e

        begin = env.get("VCENTER_STREAM_BEGIN", "5m")
        unit = {"s": 1, "m": 60, "h": 3600}.get(begin[-1:])
        if unit is None or not begin[:-1].isdigit():
            raise ValueError(
                f"VCENTER_STREAM_BEGIN={begin!r} needs an s/m/h suffix"
            )
        return cls(
            url=url.rstrip("/") + "/sdk",
            username=read_secret("username"),
            password=read_secret("password"),
            insecure=env.get("VCENTER_INSECURE", "false").lower() == "true",
            stream_begin=dt.timedelta(seconds=int(begin[:-1]) * unit),
        )


class VSphereSoapEventSource:
    """``ReadNextEvents``-shaped page source over the VIM SOAP API.

    ``read_page(page_size)`` returns ``(records, last_key)`` where each
    record matches ``poll_source.SCHEMA_DDL``:
    (key, created_time, event_type, user_name, message) — the same
    five fields the reference forwards into its CloudEvent envelope
    (main.go:126-140). Forward-only, like the upstream: the collector
    cursor lives server-side in the EventHistoryCollector.
    """

    def __init__(
        self, config: SoapConfig, transport: Transport | None = None
    ) -> None:
        self.config = config
        self._send = transport or _default_transport(config.insecure)
        self._collector: str | None = None

    # -- SOAP plumbing --------------------------------------------------
    def _call(self, body: str) -> ET.Element:
        raw = self._send(self.config.url, _ENVELOPE.format(body=body).encode())
        root = ET.fromstring(raw)
        fault = root.find(".//{http://schemas.xmlsoap.org/soap/envelope/}Fault")
        if fault is not None:
            raise RuntimeError(
                "vCenter SOAP fault: "
                + "".join(fault.itertext()).strip()[:500]
            )
        return root

    def _login_and_create_collector(self) -> str:
        # RetrieveServiceContent → session manager + event manager ids
        sc = self._call(
            '<vim25:RetrieveServiceContent><vim25:_this type="ServiceInstance">'
            "ServiceInstance</vim25:_this></vim25:RetrieveServiceContent>"
        )
        ids = {
            el.tag.split("}")[-1]: el.text
            for el in sc.iter()
            if el.tag.split("}")[-1]
            in ("sessionManager", "eventManager", "rootFolder")
        }
        # Every interpolated value is XML-escaped: a password (or a
        # hostile server-returned MoRef id) containing & < > ' " would
        # otherwise produce malformed XML / XML injection in the
        # Login request.
        self._call(
            f'<vim25:Login><vim25:_this type="SessionManager">'
            f"{_xml_escape(ids['sessionManager'])}</vim25:_this>"
            f"<vim25:userName>{_xml_escape(self.config.username)}"
            "</vim25:userName>"
            f"<vim25:password>{_xml_escape(self.config.password)}"
            "</vim25:password>"
            "</vim25:Login>"
        )
        begin = (
            dt.datetime.now(dt.timezone.utc) - self.config.stream_begin
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        resp = self._call(
            f'<vim25:CreateCollectorForEvents><vim25:_this type="EventManager">'
            f"{_xml_escape(ids['eventManager'])}</vim25:_this>"
            "<vim25:filter><vim25:time>"
            f"<vim25:beginTime>{begin}</vim25:beginTime>"
            "</vim25:time></vim25:filter>"
            "</vim25:CreateCollectorForEvents>"
        )
        coll = resp.find(".//{urn:vim25}returnval")
        if coll is None or not coll.text:
            raise RuntimeError("CreateCollectorForEvents returned no collector")
        return coll.text

    @staticmethod
    def _to_record(ev: ET.Element) -> tuple:
        def txt(name: str, default: str = "") -> str:
            el = ev.find(f"{{{VIM_NS}}}{name}")
            if el is None:  # explicit: an empty Element is falsy
                el = ev.find(name)
            return el.text if el is not None and el.text else default

        key = int(txt("key", "0"))
        created = txt("createdTime")
        ts = (
            dt.datetime.fromisoformat(created.replace("Z", "+00:00"))
            if created
            else dt.datetime.fromtimestamp(0, dt.timezone.utc)
        )
        # the concrete event subtype rides in xsi:type (e.g.
        # "vim25:VmPoweredOnEvent") — the same name the reference's
        # type-name derivation uses for the CloudEvent `type` suffix
        etype = (
            ev.get("{http://www.w3.org/2001/XMLSchema-instance}type")
            or "Event"
        ).split(":")[-1]
        return (
            key,
            ts,
            etype,
            txt("userName"),
            txt("fullFormattedMessage"),
        )

    # -- the page API the stream reader consumes ------------------------
    def read_page(self, page_size: int = 50) -> tuple[list[tuple], int]:
        """One ``ReadNextEvents`` poll; ``page_size`` capped at 50
        (the reference's page, main.go:107)."""
        page_size = max(1, min(int(page_size), 50))
        if self._collector is None:
            self._collector = self._login_and_create_collector()
        resp = self._call(
            '<vim25:ReadNextEvents><vim25:_this type="EventHistoryCollector">'
            f"{_xml_escape(self._collector)}</vim25:_this>"
            f"<vim25:maxCount>{page_size}</vim25:maxCount>"
            "</vim25:ReadNextEvents>"
        )
        records = [
            self._to_record(ev)
            for ev in resp.findall(".//{urn:vim25}returnval")
        ]
        records.sort(key=lambda r: r[0])
        last = records[-1][0] if records else -1
        return records, last
