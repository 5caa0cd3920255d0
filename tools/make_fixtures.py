#!/usr/bin/env python3
"""Static-fixture oracle generator (dev tool only — NOT part of the library).

Pre-computes ground-truth outputs for the queries whose semantics DuckDB
cannot express, using INDEPENDENT implementations:

- f4_fuzz_ratio: Python's own difflib (the reference's vendored-fuzzywuzzy
  algorithm, GetWeta.py:236-237) over part.(p_name, p_type);
- e2e_jumps_endpoint / e2e_jumps_grouped_csv: a direct Python
  re-implementation of the reference's jumps serving pipeline
  (dwwApi.js:100-138, 244-315 + locUtils.js trip math) over the dressed
  credits of PipelineQueries (mapping confirmed hash-green by
  e2e_normalize's oracle).

Each fixture carries every SF's rows tagged with `sf_key` = the row count
of the driving table at that SF, so one static oracle SQL selects the
right slice at check time: WHERE sf_key = (SELECT count(*) FROM part).

Usage: python3 tools/make_fixtures.py   (writes /root/repo/fixtures/*.parquet)
"""
import difflib, math, os
from datetime import datetime, timezone

import duckdb

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = "/root/repo/fixtures"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def fuzz_ratio(a, b):
    """fuzzywuzzy ratio: int(round(100 * 2M/T)) with Python-2 half-up
    rounding (the reference is Python 2; GetWeta.py:236-237)."""
    a = a or ""
    b = b or ""
    t = len(a) + len(b)
    if t == 0:
        return 100
    m = sum(bl.size for bl in difflib.SequenceMatcher(None, a, b).get_matching_blocks())
    return int(math.floor(100.0 * 2.0 * m / t + 0.5))


# --- geo + trip math (locUtils.js:1-35), shared by the e2e fixtures ---
def dist_km(lat1, lon1, lat2, lon2):
    r = 6371
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    x = (math.sin(dlat / 2) ** 2 +
         math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2) ** 2)
    return r * 2 * math.atan2(math.sqrt(x), math.sqrt(1 - x))


def trip_days(g1, g2):
    return max(math.floor(dist_km(g1[0], g1[1], g2[0], g2[1]) / 100), 1)


# the dressed-credit dims of PipelineQueries.dims (oracle-confirmed by
# e2e_normalize: status O/F/P -> Studio O/F/P, wellington/london/LA)
COMPANY = {"O": "Studio O", "F": "Studio F", "P": "Studio P"}
GEO = {"O": (-41.3, 174.8), "F": (51.5, -0.1), "P": (34.0, -118.2)}
LOC = {"O": "wellington", "F": "london", "P": "los angeles"}
REGION = {"O": "oceania", "F": "europe", "P": "americas"}


def epoch_ms(d):
    return int(datetime(d.year, d.month, d.day, tzinfo=timezone.utc).timestamp() * 1000)


def jumps_pipeline(sf):
    """Per person: order by (releaseStr, movieId-string), consecutive-company
    dedup, dummy in-transit records between jumps."""
    rows = con.execute(f"""
        SELECT o.o_custkey::VARCHAR, o.o_orderkey::VARCHAR, o.o_orderdate,
               o.o_orderstatus, c.c_name
        FROM '{sf}/orders.parquet' o JOIN '{sf}/customer.parquet' c
          ON o.o_custkey = c.c_custkey""").fetchall()
    people = {}
    for pid, mid, dt, status, name in rows:
        st = status if status in COMPANY else "P"
        people.setdefault(pid, []).append(
            (str(dt.date() if hasattr(dt, "date") else dt), mid, st, name))
    out = {}
    for pid, rels in people.items():
        rels.sort(key=lambda r: (r[0], r[1]))
        kept = []
        for r in rels:
            if not kept or COMPANY[r[2]] != COMPANY[kept[-1][2]]:
                kept.append(r)
        out[pid] = kept
    return out


def make_f4():
    recs = []
    for sf in SFS:
        n = con.execute(f"SELECT count(*) FROM '{sf}/part.parquet'").fetchone()[0]
        for pk, name, typ in con.execute(
                f"SELECT p_partkey, p_name, p_type FROM '{sf}/part.parquet'").fetchall():
            recs.append((n, pk, fuzz_ratio(name, typ)))
    con.execute("CREATE OR REPLACE TABLE f4(sf_key BIGINT, p_partkey BIGINT, ratio INT)")
    con.executemany("INSERT INTO f4 VALUES (?, ?, ?)", recs)
    con.execute(f"COPY f4 TO '{OUT}/f4_fuzz_ratio.parquet' (FORMAT PARQUET)")
    print("f4 rows:", len(recs))


def make_e2e_endpoint():
    recs = []
    for sf in SFS:
        n = con.execute(f"SELECT count(*) FROM '{sf}/orders.parquet'").fetchone()[0]
        for pid, kept in jumps_pipeline(sf).items():
            times = [epoch_ms(datetime.strptime(r[0], "%Y-%m-%d")) for r in kept]
            for i, r in enumerate(kept):
                recs.append((n, pid, COMPANY[r[2]], times[i], False))
                if i + 1 < len(kept):
                    t = times[i + 1] - trip_days(GEO[r[2]], GEO[kept[i + 1][2]]) * 86400000
                    recs.append((n, pid, COMPANY[r[2]], t, True))
    con.execute("""CREATE OR REPLACE TABLE e2e_ep(
        sf_key BIGINT, personId VARCHAR, company VARCHAR, time_ms BIGINT, dummy BOOLEAN)""")
    con.executemany("INSERT INTO e2e_ep VALUES (?, ?, ?, ?, ?)", recs)
    con.execute(f"COPY e2e_ep TO '{OUT}/e2e_jumps_endpoint.parquet' (FORMAT PARQUET)")
    print("e2e endpoint rows:", len(recs))


def make_e2e_grouped_csv():
    # dir=in, target 'studio f': rows whose NEXT company is Studio F
    recs = []
    for sf in SFS:
        n = con.execute(f"SELECT count(*) FROM '{sf}/orders.parquet'").fetchone()[0]
        for pid, kept in jumps_pipeline(sf).items():
            times = [epoch_ms(datetime.strptime(r[0], "%Y-%m-%d")) for r in kept]
            for i in range(len(kept) - 1):
                if COMPANY[kept[i + 1][2]].lower() == "studio f":
                    st = kept[i][2]
                    recs.append((n, kept[i][3], "Artist", times[i], COMPANY[st],
                                 LOC[st], REGION[st]))
    con.execute("""CREATE OR REPLACE TABLE e2e_csv(
        sf_key BIGINT, person VARCHAR, role VARCHAR, date BIGINT,
        company VARCHAR, location VARCHAR, region VARCHAR)""")
    con.executemany("INSERT INTO e2e_csv VALUES (?, ?, ?, ?, ?, ?, ?)", recs)
    con.execute(f"COPY e2e_csv TO '{OUT}/e2e_jumps_grouped_csv.parquet' (FORMAT PARQUET)")
    print("e2e grouped csv rows:", len(recs))


GEOSTR = {"O": "-41.3,174.8", "F": "51.5,-0.1", "P": "34.0,-118.2"}


def make_e2e_envelope():
    """e2e_jumps_envelope: the FULL unfiltered serving envelope
    (dwwApi.js:201-223) as ONE canonical JSON string per SF — keys sorted,
    compact separators — built from this file's independent jumps
    reimplementation. Spark's Envelope.canonicalJson must reproduce it
    character-for-character."""
    import json
    recs = []
    for sf in SFS:
        n = con.execute(f"SELECT count(*) FROM '{sf}/orders.parquet'").fetchone()[0]
        people = jumps_pipeline(sf)
        docs = []
        statuses_seen = set()
        for pid in sorted(people):  # sort_array(struct(id,...)): id string order
            kept = people[pid]
            times = [epoch_ms(datetime.strptime(r[0], "%Y-%m-%d")) for r in kept]
            name = kept[0][3]
            rels = []
            for i, r in enumerate(kept):
                st = r[2]
                statuses_seen.add(st)
                rels.append({
                    "seq": 2 * i, "dummy": False,
                    "imdbMovieId": r[1],
                    "matchedCompanyName": COMPANY[st],
                    "movieReleaseYear": times[i],
                    "personMappedRole": "Artist",
                    "region": LOC[st],
                    "location": GEOSTR[st]})
                if i + 1 < len(kept):
                    t = times[i + 1] - trip_days(GEO[st], GEO[kept[i + 1][2]]) * 86400000
                    rels.append({
                        "seq": 2 * i + 1, "dummy": True,
                        "imdbMovieId": r[1],
                        "matchedCompanyName": COMPANY[st],
                        "movieReleaseYear": t,
                        "personMappedRole": "Artist",
                        "region": LOC[st],
                        "location": None})
            docs.append({"id": pid, "name": name, "rels": rels})
        env = {
            "jumps": docs,
            # dwwApi.js:122: exactly the companies observed in served rels
            "locations": {COMPANY[s]: GEOSTR[s] for s in statuses_seen},
            "regions": {LOC[s]: {"geoLoc": GEOSTR[s], "globalRegion": REGION[s]}
                        for s in ["O", "F", "P"]},
            "globalRegions": {"oceania": "-25.0,140.0", "europe": "50.0,9.0",
                              "americas": "39.8,-98.5"}}
        recs.append((n, json.dumps(env, sort_keys=True, separators=(",", ":"),
                                   ensure_ascii=False)))
    con.execute("""CREATE OR REPLACE TABLE e2e_env(
        sf_key BIGINT, envelope_json VARCHAR)""")
    con.executemany("INSERT INTO e2e_env VALUES (?, ?)", recs)
    con.execute(f"COPY e2e_env TO '{OUT}/e2e_envelope_json.parquet' (FORMAT PARQUET)")
    print("e2e envelope rows:", len(recs), "len0:", len(recs[0][1]))


def make_mm3():
    """mm3_features: independent reimplementation of Multimodal.decodeStub
    (FNV-ish fold over SIGNED utf-8 bytes, one LCG step, ((h>>>40) % 1000)
    / 1000.0f in float32), then Spark's HALF_UP round to 4dp on the double
    promotion. Proves the whole mapPartitions plumbing end-to-end."""
    import numpy as np
    mask = (1 << 64) - 1
    recs = []
    for sf in SFS:
        rows = con.execute(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id").fetchall()
        # documents has the SAME row count at sf0.001 and sf0.01 (different
        # content), so the slice key is sum(n_chars), not count(*)
        n = con.execute(
            f"SELECT sum(n_chars) FROM '{sf}/documents.parquet'").fetchone()[0]
        for doc_id, text in rows:
            data = (text or "").encode("utf-8")
            h = 1125899906842597
            for b in data:
                sb = b - 256 if b >= 128 else b
                h = (31 * h + sb) & mask
            h = (h * 6364136223846793005 + 1442695040888963407) & mask
            x = float(np.float32((h >> 40) % 1000) / np.float32(1000.0))
            recs.append((n, doc_id, math.floor(x * 10000 + 0.5) / 10000.0))
    con.execute("""CREATE OR REPLACE TABLE mm3(
        sf_key BIGINT, media_id BIGINT, f0 DOUBLE)""")
    con.executemany("INSERT INTO mm3 VALUES (?, ?, ?)", recs)
    con.execute(f"COPY mm3 TO '{OUT}/mm3_features.parquet' (FORMAT PARQUET)")
    print("mm3 rows:", len(recs))


def make_mm4():
    """mm4_perceptual_dedup: independent reimplementation of
    Multimodal.perceptualHash — the decodeStub LCG run for 64 features,
    float64 mean over the float32 values (left-to-right like Spark's
    aggregate fold), bit = f > mean, bits packed MSB-first into a signed
    64-bit fingerprint."""
    import numpy as np
    mask = (1 << 64) - 1
    dim = 64
    recs = []
    for sf in SFS:
        rows = con.execute(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id").fetchall()
        n = con.execute(
            f"SELECT sum(n_chars) FROM '{sf}/documents.parquet'").fetchone()[0]
        for doc_id, text in rows:
            data = (text or "").encode("utf-8")
            h = 1125899906842597
            for b in data:
                sb = b - 256 if b >= 128 else b
                h = (31 * h + sb) & mask
            feats = []
            for _ in range(dim):
                h = (h * 6364136223846793005 + 1442695040888963407) & mask
                feats.append(float(np.float32((h >> 40) % 1000) / np.float32(1000.0)))
            mean = 0.0
            for f in feats:
                mean += f
            mean /= dim
            ph = 0
            for i, f in enumerate(feats):
                if f > mean:
                    ph += 1 << (dim - 1 - i)
            if ph >= 1 << 63:
                ph -= 1 << 64  # signed BIGINT
            recs.append((n, doc_id, ph))
    con.execute("""CREATE OR REPLACE TABLE mm4(
        sf_key BIGINT, media_id BIGINT, phash BIGINT)""")
    con.executemany("INSERT INTO mm4 VALUES (?, ?, ?)", recs)
    con.execute(f"COPY mm4 TO '{OUT}/mm4_phash.parquet' (FORMAT PARQUET)")
    print("mm4 rows:", len(recs))


def make_tok4(n_merges=1000):
    """Independent BPE trainer for tok4_bpe_1k: full pair recount per
    round (the engine uses an incremental pair index — different
    algorithm shape, same contract): overlapping weighted adjacent-pair
    counts over the (word, freq) table, winner by (cnt DESC, a, b) with
    ties compared as UTF-8 BYTES (Spark StringType binary order), greedy
    left-to-right fold where the produced token becomes the new left
    neighbor, early stop when no pairs remain."""
    import re
    recs = []
    for sf in SFS:
        # documents has the SAME row count at sf0.001 and sf0.01 (different
        # content) — slice key is sum(n_chars), the mm3/mm4 convention
        n = con.execute(
            f"SELECT sum(n_chars) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        docs = con.execute(
            f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
            " WHERE text IS NOT NULL").fetchall()
        freq = {}
        for (text,) in docs:
            for w in re.findall(r'[^ \t\n\r\f]+', text.lower()):
                freq[w] = freq.get(w, 0) + 1
        words = {w: list(w) for w in freq}  # list(str) = code points
        for rank in range(1, n_merges + 1):
            counts = {}
            for w, toks in words.items():
                f = freq[w]
                for i in range(len(toks) - 1):
                    p = (toks[i], toks[i + 1])
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            (a, b), cnt = min(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0][0].encode('utf-8'),
                                kv[0][1].encode('utf-8')))
            recs.append((n, rank, a, b, a + b, cnt))
            merged = a + b
            for w, toks in words.items():
                nt = [toks[0]]
                for t in toks[1:]:
                    if nt[-1] == a and t == b:
                        nt[-1] = merged
                    else:
                        nt.append(t)
                words[w] = nt
    con.execute("""CREATE OR REPLACE TABLE tok4(
        sf_key BIGINT, merge_rank INTEGER, a VARCHAR, b VARCHAR,
        merged VARCHAR, cnt BIGINT)""")
    con.executemany("INSERT INTO tok4 VALUES (?, ?, ?, ?, ?, ?)", recs)
    con.execute(f"COPY tok4 TO '{OUT}/tok4_bpe_merges.parquet' (FORMAT PARQUET)")
    print("tok4 rows:", len(recs))


def make_tok5(n_merges=1000):
    """Per-doc encoding under the tok4 model, for tok5_bpe_encode_1k:
    trains the same independent BPE as make_tok4, then re-encodes every
    document — since training applies each winner to every corpus word,
    the final words dict IS the rank-ordered fold of the full merge list
    over each distinct word, so per-doc (n_words, n_tokens) is a plain
    lookup-sum. Docs whose text yields zero words are omitted (the
    engine's explode+join drops them identically)."""
    import re
    recs = []
    for sf in SFS:
        n = con.execute(
            f"SELECT sum(n_chars) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
            " WHERE text IS NOT NULL").fetchall()
        freq = {}
        for _, text in docs:
            for w in re.findall(r'[^ \t\n\r\f]+', text.lower()):
                freq[w] = freq.get(w, 0) + 1
        words = {w: list(w) for w in freq}
        for rank in range(1, n_merges + 1):
            counts = {}
            for w, toks in words.items():
                f = freq[w]
                for i in range(len(toks) - 1):
                    p = (toks[i], toks[i + 1])
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            (a, b), cnt = min(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0][0].encode('utf-8'),
                                kv[0][1].encode('utf-8')))
            merged = a + b
            for w, toks in words.items():
                nt = [toks[0]]
                for t in toks[1:]:
                    if nt[-1] == a and t == b:
                        nt[-1] = merged
                    else:
                        nt.append(t)
                words[w] = nt
        for doc_id, text in docs:
            ws = re.findall(r'[^ \t\n\r\f]+', text.lower())
            if ws:
                recs.append((n, doc_id, len(ws),
                             sum(len(words[w]) for w in ws)))
    con.execute("""CREATE OR REPLACE TABLE tok5(
        sf_key BIGINT, doc_id BIGINT, n_words BIGINT, n_tokens BIGINT)""")
    con.executemany("INSERT INTO tok5 VALUES (?, ?, ?, ?)", recs)
    con.execute(f"COPY tok5 TO '{OUT}/tok5_bpe_encode.parquet' (FORMAT PARQUET)")
    print("tok5 rows:", len(recs))


if __name__ == "__main__":
    make_f4()
    make_e2e_endpoint()
    make_e2e_grouped_csv()
    make_e2e_envelope()
    make_mm3()
    make_mm4()
    make_tok4()
    make_tok5()
