"""Single-process oracle simulator — reference-faithful crawl replay.

Re-implements the reference's sequential decision loop
(/root/reference/scraper/home_depo.py:393-599: project → filter →
dedup-against-state → register rule; plus the robots/is_active gate
canada_ircc.py:63-74 and per-run budget) in plain Python over pandas,
so the distributed engine's crawl order, URL-seen set, extracted
text, and workshop decisions can be asserted EQUAL to a single-node
ground truth (SURVEY.md §5 item 2).

Shares ``canonicalize_url`` and ``extract_pdf`` with the engine — the
same code objects — which is what makes "byte-identical extracted
text per url" checkable rather than aspirational.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from zlib import crc32

import pandas as pd

from pyppeteer_scraper_spark.functions.canonicalize import canonicalize_url
from pyppeteer_scraper_spark.plans.extract import extract_pdf
from pyppeteer_scraper_spark.plans.round import ROUND_INTERVAL_MS


def _domain(url: str) -> str:
    host = url.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0].lower()
    host = host.rsplit(":", 1)[0] if host.count(":") else host
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


@dataclass
class OracleResult:
    batches: list[list[str]] = field(default_factory=list)  # per round, ordered
    seen: dict[str, int] = field(default_factory=dict)  # url -> first round
    texts: dict[str, str] = field(default_factory=dict)  # url -> extracted text
    workshops: dict[str, dict] = field(default_factory=dict)  # event_code -> record
    frontier: dict[str, dict] = field(default_factory=dict)  # url -> row
    actions: list[list[tuple]] = field(default_factory=list)  # per round: (code, register)
    errors: list[list[tuple]] = field(default_factory=list)  # per round: (url, error_kind)
    fetch_attempts: dict[str, int] = field(default_factory=dict)  # url -> last attempt


def simulate(
    pages_pdf: pd.DataFrame,
    seeds_pdf: pd.DataFrame,
    robots_pdf: pd.DataFrame,
    n_rounds: int,
) -> OracleResult:
    # --- prepare pages: canonical url -> earliest (warc_ts, raw url) row
    pp = pages_pdf.copy()
    pp["canon"] = [canonicalize_url(u) for u in pp["url"]]
    pp = pp.sort_values(["canon", "warc_ts", "url"], kind="mergesort")
    pp = pp.drop_duplicates("canon", keep="first").set_index("canon")

    robots = robots_pdf.set_index("domain")

    res = OracleResult()

    # --- frontier from seeds (dedup, min priority)
    for _, row in seeds_pdf.iterrows():
        u = canonicalize_url(row["url"])
        if not u:
            continue
        prev = res.frontier.get(u)
        pr = int(row["priority"])
        if prev is None or pr < prev["priority"]:
            res.frontier[u] = {
                "url": u,
                "priority": pr,
                "depth": 0,
                "discovered": 0,
                "state": "pending",
                "domain": _domain(u),
                # cron-tier analog: hourly (pr 0) vs daily (pr 1)
                "revisit": 1 if pr == 0 else 2,
                "last_fetch": -1,
            }

    for rnd in range(1, n_rounds + 1):
        # due revisits re-enter pending (cron re-run analog)
        for r in res.frontier.values():
            if (
                r["state"] == "fetched"
                and r["revisit"] > 0
                and rnd - r["last_fetch"] >= r["revisit"]
            ):
                r["state"] = "pending"

        pending = [r for r in res.frontier.values() if r["state"] == "pending"]

        # robots gate
        batch_rows = []
        for r in pending:
            dom = r["domain"]
            allow = bool(robots.loc[dom, "allow"]) if dom in robots.index else True
            if not allow:
                r["state"] = "blocked"

        pending = [r for r in res.frontier.values() if r["state"] == "pending"]

        # per-domain politeness cap under the total order, scaled by the
        # crawl delay (cap = min(max_per_round, window // delay); delay
        # past the window → skip-round turns, crc32-phased — mirrors
        # select_batch exactly)
        by_dom: dict[str, list[dict]] = {}
        for r in pending:
            by_dom.setdefault(r["domain"], []).append(r)
        for dom, rows in by_dom.items():
            if dom in robots.index:
                row = robots.loc[dom]
                cap = int(row["max_per_round"])
                # pandas renders a NULL long as NaN, which is truthy —
                # coalesce to 0 like the engine (F.coalesce(delay, 0))
                d = row.get("crawl_delay_ms", 0)
                delay = 0 if d is None or pd.isna(d) else int(d)
            else:
                cap, delay = 4, 0
            if delay > 0:
                if delay <= ROUND_INTERVAL_MS:
                    cap = min(cap, ROUND_INTERVAL_MS // delay)
                else:
                    stride = -(-delay // ROUND_INTERVAL_MS)  # ceil
                    on_turn = rnd % stride == crc32(dom.encode()) % stride
                    cap = 1 if on_turn else 0
            rows.sort(key=lambda r: (r["priority"], r["depth"], r["discovered"], r["url"]))
            batch_rows.extend(rows[:cap])

        batch_rows.sort(key=lambda r: (r["priority"], r["depth"], r["discovered"], r["url"]))
        res.batches.append([r["url"] for r in batch_rows])

        # fetch + extract (shared extraction code ⇒ byte-identical text).
        # Two channels: primary first; fallback-only pages are recovered
        # on attempt 2 (the reference's playwright→requests fallback);
        # URLs in neither source raise one fetch_empty error per round.
        found_urls, found_raw = [], []
        round_errors: list[tuple] = []
        for r in batch_rows:
            if r["last_fetch"] == -1:
                res.seen[r["url"]] = rnd
            r["last_fetch"] = rnd
            if r["url"] in pp.index:
                r["state"] = "fetched"
                page = pp.loc[r["url"]]
                via = page.get("fetch_via", "primary") if hasattr(page, "get") else "primary"
                res.fetch_attempts[r["url"]] = 2 if via == "fallback" else 1
                found_urls.append(r["url"])
                found_raw.append(page)
            else:
                r["state"] = "missing"
                round_errors.append((r["url"], "fetch_empty"))

        if found_raw:
            fetched_pdf = pd.DataFrame(
                {
                    "url": found_urls,
                    "html": [x["html"] for x in found_raw],
                    "lang": [x["lang"] for x in found_raw],
                }
            )
            ext = extract_pdf(fetched_pdf)
        else:
            ext = pd.DataFrame(columns=["url", "title", "text", "lang", "links", "payload_json"])

        parent = {r["url"]: r for r in batch_rows}
        new_links: dict[str, dict] = {}
        round_actions: list[tuple] = []
        for _, row in ext.iterrows():
            res.texts[row["url"]] = row["text"]
            p = parent[row["url"]]
            for link in row["links"]:
                u = canonicalize_url(link)
                if not (u.startswith("http://") or u.startswith("https://")):
                    continue
                cand = new_links.get(u)
                if cand is None:
                    new_links[u] = {
                        "url": u,
                        "priority": p["priority"],
                        "depth": p["depth"] + 1,
                        "discovered": rnd,
                        "state": "pending",
                        "domain": _domain(u),
                        "revisit": 0,
                        "last_fetch": -1,
                    }
                else:
                    cand["priority"] = min(cand["priority"], p["priority"])
                    cand["depth"] = min(cand["depth"], p["depth"] + 1)

            # workshop decision replay (home_depo.py:393-599, two-phase:
            # discovered → alert every run until registered → registered).
            # Error contract (e2e:599-700): bad JSON → json_parse error;
            # parsed but key absent → missing_key; EMPTY list → no error.
            if isinstance(row["payload_json"], str) and row["payload_json"]:
                try:
                    payload = json.loads(row["payload_json"])
                except json.JSONDecodeError:
                    round_errors.append((row["url"], "json_parse"))
                    continue
                if "workshopEventWsDTO" not in payload:
                    round_errors.append((row["url"], "missing_key"))
                    continue
                for event in payload["workshopEventWsDTO"] or []:
                    seats_left = event.get("remainingSeats", 0)
                    if seats_left == 0:
                        continue
                    if event.get("workshopType") != "KID":
                        continue
                    if event.get("workshopStatus") != "ACTIVE":
                        continue
                    code = event.get("code")
                    known = res.workshops.get(code)
                    if known is not None and known["is_registered"]:
                        continue  # registered → skip, no alert
                    taken = event.get("attendeeLimit", 0) - seats_left
                    start = event.get("startTime", "")
                    register = ("08:30" in start) and taken >= 1
                    round_actions.append((code, register))
                    if known is None:
                        res.workshops[code] = {
                            "event_code": code,
                            "workshop_id": event.get("workshopId"),
                            "title": event.get("eventType", {}).get("name"),
                            "start_time": start,
                            "seats_taken": taken,
                            "is_registered": register,
                            "discovered_round": rnd,
                        }
                    elif register:
                        known["is_registered"] = True
                        known["registered_round"] = rnd

        for u, row in new_links.items():
            if u in res.seen or u in res.frontier:
                continue
            res.frontier[u] = row
        res.actions.append(sorted(round_actions))
        res.errors.append(sorted(round_errors))

    return res
