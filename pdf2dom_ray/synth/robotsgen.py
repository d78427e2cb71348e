"""Deterministic robots.txt writer for the synthetic crawl hosts.

The third member of the crawl-discovery file trio (WARC archives,
sitemap XML, robots.txt): one RFC 9309 robots file per synthetic
host, with a badbot-blocking group, a general group whose rules vary
per host index, a Crawl-delay extension line and a Sitemap pointer —
the record mix a real robots parser must handle (group merging,
unknown fields passed through, blank-line group breaks, comments).

The rules are a pure function of the host index h (these rules ARE
the SQL oracle for ``robots_ingest`` in ``__ray_entry__.py`` — change
them together and bump ROBOTSGEN_VERSION, the CLAUDE.md coupling
rule):

    User-agent: badbot            Disallow: /
    User-agent: *                 Disallow: /d/{h}
                                  Allow: /d/{h}{h}$
                                  Crawl-delay: {h+1}
    Sitemap: https://{sub}.synth.test/sitemapindex_{sub}.xml

Re-running the writer produces byte-identical files.
"""

from __future__ import annotations

import os

from .sitemapgen import HOST_SUBS

__all__ = ["ROBOTSGEN_VERSION", "robots_text", "expected_rows",
           "write_robots_files"]

ROBOTSGEN_VERSION = 1


def robots_text(h: int) -> str:
    sub = HOST_SUBS[h]
    return (
        "# synthetic robots fixture\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        f"Disallow: /d/{h}\n"
        f"Allow: /d/{h}{h}$\n"
        f"Crawl-delay: {h + 1}\n"
        "\n"
        f"Sitemap: https://{sub}.synth.test/"
        f"sitemapindex_{sub}.xml\n")


def expected_rows(h: int) -> list[tuple[str, str, int, str, str]]:
    """(host, agent, seq, field, value) rows the parser must emit for
    host index h — the oracle's closed form."""
    sub = HOST_SUBS[h]
    host = f"{sub}.synth.test"
    return [
        (host, "badbot", 0, "disallow", "/"),
        (host, "*", 1, "disallow", f"/d/{h}"),
        (host, "*", 2, "allow", f"/d/{h}{h}$"),
        (host, "*", 3, "crawl-delay", str(h + 1)),
        (host, "", 4, "sitemap",
         f"https://{sub}.synth.test/sitemapindex_{sub}.xml"),
    ]


def write_robots_files(out_dir: str) -> str:
    """Write (idempotently, version-stamped) and return ``out_dir``."""
    stamp = os.path.join(out_dir, ".version")
    want = str(ROBOTSGEN_VERSION)
    if os.path.exists(stamp) and open(stamp).read() == want:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for h, sub in enumerate(HOST_SUBS):
        with open(os.path.join(out_dir,
                               f"robots_{sub}.synth.test.txt"),
                  "w") as f:
            f.write(robots_text(h))
    with open(stamp, "w") as f:
        f.write(want)
    return out_dir
