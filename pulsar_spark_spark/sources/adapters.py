"""External-side adapters: queue/HTTP push sink (K3), validation
guard (P8), retry wrapper (F14).

The reference pushes rows to REST buses from ``foreachPartition``
loops (client/BigfootClient.scala:13-45 posts groups of 200 with
restbus headers; service/CacheRefreshService.scala:99-111,
service/TripTrackingService.scala:28-44), guards sink writes with
null/shape checks (GeoTagOptimizedService.scala:110-133), and wraps
flaky calls in exponential-backoff retries (utils/Utility.scala:
116-134). The engine keeps these OUT of query plans: a pluggable
poster callable (no-op/collector by default — no network in tests),
batched per partition so the RPC count is O(partitions × batches),
never O(rows).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_retry(
    fn: Callable,
    attempts: int = 3,
    base_delay_s: float = 0.05,
    retryable: type[Exception] = Exception,
) -> Callable:
    """F14: exponential-backoff retry wrapper (2× backoff per attempt,
    re-raises after the final one)."""

    def wrapped(*args, **kwargs):
        delay = base_delay_s
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            except retryable:
                if attempt == attempts - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        return None  # unreachable

    return wrapped


def validate_for_sink(
    df: DataFrame, required_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """P8: split a frame into (valid, rejected) on non-null required
    columns — the reference's checkNullUDTValues guard before its
    Cassandra write, kept relational so both sides stay queryable.
    With no required columns every row is valid (degenerate input,
    not an error)."""
    cond = F.lit(True)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond), df.filter(~cond)


def email_report(
    csv_path: str,
    subject: str,
    message: str,
    to: Sequence[str],
    from_addr: tuple[str, str] = ("reports@localhost", "Reports"),
    cc: Sequence[str] = (),
    mailer: Callable[[dict], None] | None = None,
    env_var: str = "SPARK_GRAFT_MAIL_ENV",
    expected_env: str = "nm",
    smtp_host: str | None = None,
) -> dict | None:
    """K5: email a written CSV report (utils/Mail.scala:30-64, used at
    batch/AccuracyAnalysis.scala:168-181).

    Reference semantics, kept as an out-of-plan notification adapter
    (SURVEY §7.3.6): the send is DRIVER-side after the distributed
    report write (K2 ``write_csv_report``), and it is env-gated
    exactly like the reference's ``APP_ENV == "nm"`` check — when the
    gate does not match, nothing is built or sent and the function
    returns None.

    ``mailer`` receives the fully-built payload dict (from/to/cc/
    subject/message + attachment name and bytes); tests pass a
    collector, production passes an SMTP-backed callable (a default
    smtplib sender is constructed when ``smtp_host`` is given). With
    neither configured the gate-passing call raises — silently
    dropping a requested report is the one behavior the reference
    never has.
    """
    import os as _os

    if _os.environ.get(env_var, "default") != expected_env:
        return None
    with open(csv_path, "rb") as f:
        payload = {
            "from": from_addr,
            "to": list(to),
            "cc": list(cc),
            "subject": subject,
            "message": message,
            "attachment_name": _os.path.basename(csv_path),
            "attachment": f.read(),
        }
    if mailer is None:
        if smtp_host is None:
            raise ValueError(
                "email_report gate matched but no mailer/smtp_host configured"
            )

        def mailer(p: dict) -> None:  # pragma: no cover - needs SMTP
            import smtplib
            from email.message import EmailMessage

            msg = EmailMessage()
            msg["From"] = f'{p["from"][1]} <{p["from"][0]}>'
            msg["To"] = ", ".join(p["to"])
            if p["cc"]:
                msg["Cc"] = ", ".join(p["cc"])
            msg["Subject"] = p["subject"]
            msg.set_content(p["message"])
            msg.add_attachment(
                p["attachment"],
                maintype="text",
                subtype="csv",
                filename=p["attachment_name"],
            )
            with smtplib.SMTP(smtp_host) as s:
                s.send_message(msg)

    mailer(payload)
    return payload


def push_partitions(
    df: DataFrame,
    poster: Callable[[list[dict]], None],
    batch_size: int = 200,
    attempts: int = 3,
) -> None:
    """K3: batched queue/HTTP push from the executors.

    Rows are grouped into ``batch_size`` chunks per partition (the
    reference's Bigfoot group size) and handed to ``poster`` — a
    callable like ``lambda rows: requests.post(url, json=rows)`` in
    production, a local collector in tests. Retries with backoff per
    batch; a batch that keeps failing fails the task (and Spark's task
    retry takes over), so delivery is at-least-once like the
    reference's.
    """
    posted = with_retry(poster, attempts=attempts)

    def handle(rows) -> None:
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                posted(buf)
                buf = []
        if buf:
            posted(buf)

    df.foreachPartition(handle)
