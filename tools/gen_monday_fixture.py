#!/usr/bin/env python3
"""Generate the synthetic Monday.com GraphQL response fixture (FIXTURES.md §B.1).

Deterministic (seed 42). One JSON file per board per snapshot date under
src/test/resources/monday/<board>/<date>[_pN].json, shaped like the
reference's GraphQL responses (items_page envelope per etl_quick_fix.py:96-131,
nested subitems with column metadata per monday_etl_automated.py:200-232).

Snapshot dates: 2025-06-23, 24, 25, then a gap day, then 27 (exercises
freshness/window queries downstream). The projects board on 06-27 is split
into two cursor-linked pages (pagination in the raw layer).

Edge cases planted (all pinned by SURVEY §2.7/§7 semantics):
  - empty text ""            -> string default None / number default 0
  - non-numeric numbers text -> revenue/amount stays 0, not null
  - malformed date text      -> null
  - timeline with 1/3 parts  -> both dates null
  - "start - garbage"        -> start set, end null
  - "garbage - end"          -> BOTH null (reference aborts mid-assignment)
  - two status columns       -> first non-empty wins
  - multi numbers columns    -> LAST float-parseable non-empty wins (the
                                reference overwrites per parseable match)
  - malformed board_relation value JSON -> linked name set, id null
  - empty linkedPulseIds []  -> id null
  - item with subitems null and subitems []
"""
import json
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "monday")
DATES = ["2025-06-23", "2025-06-24", "2025-06-25", "2025-06-27"]
STATI = ["Won", "Lost", "In Pipeline", "Negotiation"]
CIRCOLI = ["Radical", "WoW", "GCC", "BDTC"]
TIPOLOGIE = ["Consulting", "Delivery", "Training"]
PEOPLE = ["Mario Rossi", "Anna Bianchi", "Luca Verdi", "Sara Neri", "Paolo Gallo"]


def cv(cid, text, value=None, ctype=None, title=None):
    d = {"id": cid, "text": text, "value": value}
    if ctype is not None:
        d["column"] = {"id": cid, "title": title or cid, "type": ctype}
    return d


def iso(day, hour, minute=0):
    return f"{day}T{hour:02d}:{minute:02d}:00Z"


def make_projects(day_idx, rng):
    day = DATES[day_idx]
    items = []
    n_projects = 24 + 3 * day_idx
    for p in range(n_projects):
        pid = str(101 + p)
        cols = [
            cv("person", rng.choice(PEOPLE)),
            cv("date4", f"2025-0{1 + p % 5}-{10 + p % 18:02d}",
               value=json.dumps({"date": f"2025-0{1 + p % 5}-{10 + p % 18:02d}"})),
            cv("status__1", rng.choice(["VAR", "NON VAR"])),
            cv("status_1", CIRCOLI[p % 4]),
            cv("status0", TIPOLOGIE[p % 3]),
            cv("status1", STATI[(p + day_idx) % 4]),
            cv("status6", "Aperto" if p % 5 else "Chiuso"),
        ]
        subitems = []
        n_sub = (p * 7 + 3) % 13  # 0..12 children, some parents childless
        for q in range(n_sub):
            sid = str(5000 + p * 20 + q)
            rev = round(rng.uniform(500, 20000), 2)
            scols = [
                cv("numbers9", str(rev), value=json.dumps(str(rev)),
                   ctype="numbers", title="Revenue"),
                cv("person", rng.choice(PEOPLE), ctype="person", title="PO"),
                cv("timeline3", f"2025-0{1 + q % 3}-01 - 2025-0{4 + q % 3}-30",
                   ctype="timeline", title="Timeline"),
                cv("status2", ["In corso", "Completato", "Bloccato"][q % 3],
                   ctype="status", title="Status"),
            ]
            subitems.append({
                "id": sid, "name": f"Phase {q + 1} of P{pid}",
                "created_at": iso(day, 8, q % 60), "updated_at": iso(day, 9, q % 60),
                "column_values": scols,
            })
        items.append({
            "id": pid, "name": f"Project {pid}",
            "created_at": iso("2025-06-01", 8), "updated_at": iso(day, 7),
            "column_values": cols,
            "subitems": subitems,
        })

    # ---- planted edge-case items (stable ids, same every snapshot) ----------
    items.append({  # all-empty texts -> every mapped field keeps its default
        "id": "901", "name": "Edge empty", "created_at": iso("2025-06-02", 8),
        "updated_at": iso(day, 7),
        "column_values": [cv("person", ""), cv("date4", ""), cv("status__1", ""),
                          cv("status_1", ""), cv("status0", ""), cv("status1", ""),
                          cv("status6", "")],
        "subitems": [],
    })
    items.append({  # malformed date + missing columns + null subitems
        "id": "902", "name": "Edge malformed", "created_at": iso("2025-06-02", 8),
        "updated_at": iso(day, 7),
        "column_values": [cv("date4", "30/06/2025"), cv("status_1", "Radical")],
        "subitems": None,
    })
    items.append({  # subitem edge cases
        "id": "903", "name": "Edge subitems", "created_at": iso("2025-06-03", 8),
        "updated_at": iso(day, 7),
        "column_values": [cv("person", "Mario Rossi")],
        "subitems": [
            {"id": "9031", "name": "non-numeric revenue",
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("numbers9", "N/A", ctype="numbers", title="Revenue"),
                 cv("timeline3", "TBD", ctype="timeline", title="Timeline"),
                 cv("status2", "In corso", ctype="status", title="Status"),
             ]},
            {"id": "9032", "name": "two status cols, first wins",
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("status2", "FIRST", ctype="status", title="Status"),
                 cv("status3", "SECOND", ctype="status", title="Status B"),
                 cv("numbers9", "", ctype="numbers", title="Revenue"),
             ]},
            {"id": "9033", "name": "empty-then-status: first NON-EMPTY wins",
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("status2", "", ctype="status", title="Status"),
                 cv("status3", "WINS", ctype="status", title="Status B"),
                 cv("timeline3", "2025-01-01 - 2025-02-01 - 2025-03-01",
                    ctype="timeline", title="Timeline"),
             ]},
            {"id": "9034", "name": "timeline start ok end garbage",
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("timeline3", "2025-01-01 - garbage", ctype="timeline",
                    title="Timeline"),
                 cv("numbers9", "12500.5", ctype="numbers", title="Revenue"),
             ]},
            {"id": "9035", "name": "timeline start garbage: both null",
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("timeline3", "garbage - 2025-03-31", ctype="timeline",
                    title="Timeline"),
             ]},
            {"id": "9036", "name": "multi numbers cols: LAST PARSEABLE wins",
             # the reference loop OVERWRITES revenue on every numbers match
             # whose text parses as float (try/except pass,
             # monday_etl_automated.py:305-308) — unlike status, which is
             # guarded first-wins. Expected 240: first-wins would give 120,
             # unguarded last-non-empty would give 0.0 (from "N/A"), an
             # empty tail must not reset anything.
             "created_at": iso(day, 8), "updated_at": iso(day, 9),
             "column_values": [
                 cv("numbers9", "120", ctype="numbers", title="Revenue"),
                 cv("numbers8", "240", ctype="numbers", title="Forecast"),
                 cv("numbers7", "N/A", ctype="numbers", title="Unparseable"),
                 cv("numbers6", "", ctype="numbers", title="Empty tail"),
                 cv("status2", "In corso", ctype="status", title="Status"),
             ]},
        ],
    })
    return items


def make_costs(board, day_idx, rng):
    """Flat cost-board items: personnel / travel / suppliers."""
    day = DATES[day_idx]
    rel_col = {"personnel": "board_relation1", "travel": "board_relation39",
               "suppliers": "board_relation"}[board]
    n = {"personnel": 30, "travel": 25, "suppliers": 20}[board] + 2 * day_idx
    items = []
    for i in range(n):
        cid = str({"personnel": 7000, "travel": 7500, "suppliers": 8000}[board] + i)
        linked_sid = str(5000 + (i * 13) % 400)
        rel_value = json.dumps({"linkedPulseIds": [{"linkedPulseId": int(linked_sid)}]})
        amount = round(rng.uniform(50, 5000), 2)
        cols = [cv(rel_col, f"Phase link {linked_sid}", value=rel_value)]
        if board == "personnel":
            cols += [cv("person", PEOPLE[i % 5]), cv("numbers", str(amount))]
        elif board == "travel":
            cols += [cv("person", PEOPLE[i % 5]), cv("numbers", str(amount)),
                     cv("date", f"2025-06-{1 + i % 28:02d}"),
                     cv("status", ["Pagata", "Da pagare"][i % 2]),
                     cv("dropdown", ["Carta", "Bonifico", "Contanti"][i % 3])]
        else:
            iva = round(amount * 0.22, 2)
            cols += [cv("numbers", str(amount)), cv("numbers8", str(iva)),
                     cv("status", TIPOLOGIE[i % 3]),
                     cv("status_1", ["Ordinato", "Consegnato", "Fatturato"][i % 3])]
        items.append({
            "id": cid, "name": f"{board} cost {cid}",
            "created_at": iso("2025-06-05", 9), "updated_at": iso(day, 10),
            "column_values": cols,
        })

    # ---- planted edge cases -------------------------------------------------
    base = {"personnel": 7900, "travel": 7950, "suppliers": 8900}[board]
    items.append({  # malformed board_relation JSON: name set, id null
        "id": str(base + 1), "name": f"{board} edge badjson",
        "created_at": iso("2025-06-05", 9), "updated_at": iso(day, 10),
        "column_values": [cv(rel_col, "Phase link broken", value="{not json"),
                          cv("numbers", "abc")],  # non-numeric -> 0
    })
    items.append({  # empty linkedPulseIds: id null; empty amount -> 0
        "id": str(base + 2), "name": f"{board} edge emptylink",
        "created_at": iso("2025-06-05", 9), "updated_at": iso(day, 10),
        "column_values": [cv(rel_col, "Phase link empty",
                             value=json.dumps({"linkedPulseIds": []})),
                          cv("numbers", "")],
    })
    items.append({  # no relation column at all; travel: malformed date
        "id": str(base + 3), "name": f"{board} edge norel",
        "created_at": iso("2025-06-05", 9), "updated_at": iso(day, 10),
        "column_values": ([cv("date", "not-a-date"), cv("status", "")]
                          if board == "travel" else [cv("person", "")]),
    })
    return items


def envelope(board_name, board_id, items, cursor=None):
    return {"data": {"boards": [{
        "id": board_id, "name": board_name,
        "items_page": {"cursor": cursor, "items": items},
    }]}}


def write(path, doc):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")


def main():
    for di, day in enumerate(DATES):
        rng = random.Random(42 + di)  # per-day seed: stable across reruns
        projects = make_projects(di, rng)
        if day == "2025-06-27":  # two cursor-linked pages
            cut = len(projects) // 2
            write(f"{OUT}/projects/{day}_p1.json",
                  envelope("Progetti", "8113598675", projects[:cut], cursor="cur-p2"))
            write(f"{OUT}/projects/{day}_p2.json",
                  envelope("Progetti", "8113598675", projects[cut:], cursor=None))
        else:
            write(f"{OUT}/projects/{day}.json",
                  envelope("Progetti", "8113598675", projects))
        for board, bid in [("personnel", "8113598810"), ("travel", "8113598920"),
                           ("suppliers", "8113599030")]:
            # fixed per-board offsets: python str hash is process-salted
            off = {"personnel": 1, "travel": 2, "suppliers": 3}[board]
            rngb = random.Random(1000 * di + off)
            write(f"{OUT}/{board}/{day}.json",
                  envelope(board, bid, make_costs(board, di, rngb)))
    print("fixture written under", os.path.normpath(OUT))


if __name__ == "__main__":
    main()
