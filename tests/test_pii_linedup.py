"""PII redaction + CCNet-style line-level dedup."""

import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.linedup import common_line_filter, doc_lines
from pdf2dom_ray.functions.pii import plant_pii, redact_pii_batch


def test_redact_patterns_and_counts():
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "reach me at jane.doe+x@sub.example.org or 212-555-0187 "
            "from 192.168.1.254 thanks",
            "no pii here at all",
        ]),
    })
    out = redact_pii_batch(t)
    rows = out.to_pylist()
    assert rows[0]["clean_text"] == \
        "reach me at <EMAIL> or <PHONE> from <IP> thanks"
    assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ips"]) \
        == (1, 1, 1)
    assert rows[1]["clean_text"] == "no pii here at all"
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) \
        == (0, 0, 0)


def test_redact_order_email_wins_over_phone():
    # a phone-looking local part is consumed by the email redaction
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["555-123-4567@example.com"])})
    row = redact_pii_batch(t).to_pylist()[0]
    assert row["clean_text"] == "<EMAIL>"
    assert row["n_phones"] == 1  # counted before replacement — by spec


def test_plant_pii_deterministic():
    assert plant_pii(6, "x y") == ("x y Contact user6@mail6.example.com "
                                   "or call 555-006-0006 from 10.0.6.42")
    assert plant_pii(1, "z") == ("z Contact user1@mail1.example.com "
                                 "or call 555-001-0001")


def _line_corpus():
    shared = " ".join(f"w{i}" for i in range(10))          # one full line
    uniq = [" ".join(f"u{d}x{i}" for i in range(10)) for d in range(4)]
    texts = [f"{shared} {uniq[0]}",      # doc 0: shared + unique
             f"{uniq[1]} {shared}",      # doc 1: unique + shared
             uniq[2],                    # doc 2: unique only
             shared]                     # doc 3: ONLY the shared line
    return pa.table({"doc_id": pa.array(range(4), pa.int64()),
                     "text": pa.array(texts)})


def _check(out):
    rows = {r["doc_id"]: r for r in out.to_pandas().to_dict("records")}
    shared = " ".join(f"w{i}" for i in range(10))
    assert rows[0]["kept_text"] == " ".join(f"u0x{i}" for i in range(10))
    assert rows[0]["n_lines"] == 2 and rows[0]["n_dropped"] == 1
    assert rows[1]["kept_text"] == " ".join(f"u1x{i}" for i in range(10))
    assert rows[2]["n_dropped"] == 0 and shared not in rows[2]["kept_text"]
    assert rows[3]["kept_text"] == "" and rows[3]["n_dropped"] == 1


def test_common_line_filter_broadcast_path(ray_session):
    _check(common_line_filter(rd.from_arrow(_line_corpus()), min_docs=2))


def test_common_line_filter_distributed_path(ray_session):
    out = common_line_filter(rd.from_arrow(_line_corpus()), min_docs=2,
                             broadcast_limit=0)
    _check(out)


def test_doc_lines_unit():
    assert doc_lines("a b c", line_words=2) == ["a b", "c"]
    assert doc_lines("") == [""]
