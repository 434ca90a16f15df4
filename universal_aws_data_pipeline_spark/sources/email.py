"""Email-attachment source: MIME parsing, header decoding, sender routing,
extension allowlist.

Parity with the reference's email-processor Lambda
(``src/lambda/email_processor/handler.py``):

- MIME parse + decoded headers ⇔ ``handler.py:103-213`` (stdlib ``email``)
- attachment extraction + extension allowlist ⇔ ``handler.py:164-175``
- sender-allowlist config routing ⇔ ``get_email_source_config``
  (``handler.py:26-58``)

The parse is driver-side (the reference does it inside one Lambda per
message); extracted attachments become a DataFrame with the payload as a
``binary`` column — the same opaque-bytes contract as the multimodal
operators (X5), so downstream decode/feature stages apply unchanged. At
scale, messages land in storage and a ``wholeTextFiles``-style batch parses
them executor-side; the per-message logic below is identical either way.
"""

from __future__ import annotations

import email
import email.header
import email.utils
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

ATTACHMENT_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("sender", StringType()),
        StructField("subject", StringType()),
        StructField("filename", StringType()),
        StructField("extension", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


@dataclass
class EmailSourceConfig:
    name: str
    allowed_senders: list[str] = field(default_factory=list)
    allowed_extensions: list[str] = field(default_factory=list)  # e.g. ["csv", "json"]


def decode_header_value(raw: str | None) -> str:
    """RFC2047 header decode (handler.py:118-130 semantics)."""
    if raw is None:
        return ""
    parts = email.header.decode_header(raw)
    out = []
    for value, charset in parts:
        if isinstance(value, bytes):
            out.append(value.decode(charset or "utf-8", errors="replace"))
        else:
            out.append(value)
    return "".join(out)


def route_config(sender: str, configs: list[EmailSourceConfig]) -> EmailSourceConfig | None:
    """Pick the first config whose allowed_senders contains the sender address
    (handler.py:26-58). Empty allowlist ⇒ matches any sender."""
    addr = email.utils.parseaddr(sender)[1].lower()
    for cfg in configs:
        if not cfg.allowed_senders or addr in [s.lower() for s in cfg.allowed_senders]:
            return cfg
    return None


def extract_attachments(raw_message: bytes, cfg: EmailSourceConfig) -> list[dict[str, Any]]:
    """Parse one MIME message; return allowlisted attachments as records."""
    msg = email.message_from_bytes(raw_message)
    sender = decode_header_value(msg.get("From"))
    if route_config(sender, [cfg]) is None:
        return []
    subject = decode_header_value(msg.get("Subject"))
    message_id = (msg.get("Message-ID") or "").strip("<>")
    records: list[dict[str, Any]] = []
    for part in msg.walk():
        if part.get_content_maintype() == "multipart":
            continue
        filename = part.get_filename()
        if not filename:
            continue
        filename = decode_header_value(filename)
        ext = os.path.splitext(filename)[1].lstrip(".").lower()
        if cfg.allowed_extensions and ext not in [e.lower() for e in cfg.allowed_extensions]:
            continue  # extension allowlist (handler.py:164-169)
        payload = part.get_payload(decode=True) or b""
        records.append(
            {
                "message_id": message_id,
                "sender": email.utils.parseaddr(sender)[1],
                "subject": subject,
                "filename": filename,
                "extension": ext,
                "n_bytes": len(payload),
                "payload": payload,
            }
        )
    return records


def email_source(spark: SparkSession, raw_messages: list[bytes], cfg: EmailSourceConfig) -> DataFrame:
    """Materialize attachments from raw MIME messages as a DataFrame."""
    records = [rec for raw in raw_messages for rec in extract_attachments(raw, cfg)]
    return spark.createDataFrame(records, schema=ATTACHMENT_SCHEMA)


def email_dir_source(spark: SparkSession, message_dir: str, cfg: EmailSourceConfig) -> DataFrame:
    """Read ``.eml`` files from a directory (the landed-message layout)."""
    raws = []
    for name in sorted(os.listdir(message_dir)):
        if name.endswith(".eml"):
            with open(os.path.join(message_dir, name), "rb") as f:
                raws.append(f.read())
    return email_source(spark, raws, cfg)
