"""Deterministic pin/geo/user fixture generator (FIXTURES.md).

Pure-Python + pyarrow (no Spark dependency) so tests can synthesize raw
inputs cheaply. Two variants:

- ``dirty``: includes every sentinel, abbreviated follower counts,
  duplicate dedup keys, NULL name parts, dangling join keys — exercises
  every cleaning rule.
- ``dedup_safe``: unique ``description`` / unique ``ind`` so the
  arbitrary-row dedup (SURVEY.md §2.13) cannot make query outputs
  nondeterministic; used for golden Q1-Q8 differential tests.
"""

from __future__ import annotations

import random
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

CATEGORIES = [
    "art", "beauty", "diy-and-crafts", "travel", "food", "quotes",
    "tattoos", "finance", "vehicles", "education",
]
COUNTRIES = [
    "United States", "India", "Brazil", "United Kingdom", "Germany",
    "France", "Japan", "Canada", "Australia", "Mexico", "Italy", "Spain",
    "Nigeria", "Kenya", "Poland", "Sweden", "Norway", "Chile", "Peru",
    "Egypt", "Turkey", "Thailand", "Vietnam", "Portugal", "Greece",
    "Ireland", "Austria", "Belgium", "Denmark", "Finland",
]
FIRST_NAMES = ["Ava", "Ben", "Cara", "Dan", "Elle", "Finn", "Gia", "Hugo", "Iris", "Jon"]
LAST_NAMES = ["Smith", "Patel", "Garcia", "Kim", "Okafor", "Novak", "Rossi", "Chen", "Silva", "Dubois"]

PIN_SENTINEL_ROWS = {
    "title": ["No Title Data Available", "Untitled"],
    "description": ["Untitled"],
    "poster_name": ["User Info Error"],
    "follower_count": ["User Info Error"],
    "tag_list": ["N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"],
    "image_src": ["Image src error."],
}


def _follower_count(rng: random.Random) -> str:
    # Heavy-tailed; mix of plain digits and "k"/"M" abbreviations.
    shape = rng.random()
    if shape < 0.5:
        return str(rng.randint(0, 999))
    if shape < 0.8:
        return f"{rng.randint(1, 999)}k"
    if shape < 0.95:
        return f"{rng.randint(1, 99)}k"
    return f"{rng.randint(1, 9)}M"


def generate_raw_tables(n_rows: int = 1000, seed: int = 42, dedup_safe: bool = False):
    """Return dict of table-name -> pyarrow.Table for raw pin/geo/user."""
    rng = random.Random(seed)
    pin_rows, geo_rows, user_rows = [], [], []
    for i in range(1, n_rows + 1):
        cat = rng.choice(CATEGORIES)
        desc = f"pin description {i} about {cat}"
        if not dedup_safe and rng.random() < 0.05 and i > 10:
            desc = f"pin description {i - rng.randint(1, 10)} about {cat}"  # dup description
        title = f"{cat} idea #{i}"
        poster = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        fc = _follower_count(rng)
        tags = ",".join(rng.sample(CATEGORIES, 3))
        if not dedup_safe:
            # sprinkle sentinels
            r = rng.random()
            if r < 0.04:
                title = "No Title Data Available"
            elif r < 0.06:
                title = "Untitled"
            if rng.random() < 0.03:
                poster = "User Info Error"
                fc = "User Info Error"
            if rng.random() < 0.03:
                tags = "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
        img = f"https://i.pinimg.com/{uuid.UUID(int=rng.getrandbits(128))}.jpg"
        if not dedup_safe and rng.random() < 0.02:
            img = "Image src error."
        pin_rows.append(
            {
                "index": i,
                "unique_id": str(uuid.UUID(int=rng.getrandbits(128))),
                "title": title,
                "description": desc,
                "poster_name": poster,
                "follower_count": fc,
                "tag_list": tags,
                "is_image_or_video": rng.choice(["image", "video", "multi-video(story page format)"]),
                "image_src": img,
                "downloaded": rng.choice(["0", "1"]),
                "save_location": f"Local save in /data/{cat}",
                "category": cat,
            }
        )
        # ~90% of pins get matching geo/user rows; some dangling both ways.
        if rng.random() < 0.9:
            year = rng.randint(2015, 2023)
            ts = f"{year}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
            geo_rows.append(
                {
                    "ind": i,
                    "country": rng.choice(COUNTRIES[: 8 if rng.random() < 0.6 else 30]),
                    "latitude": round(rng.uniform(-90, 90), 4),
                    "longitude": round(rng.uniform(-180, 180), 4),
                    "timestamp": ts,
                }
            )
            if not dedup_safe and rng.random() < 0.04:
                dup = dict(geo_rows[-1])
                dup["country"] = rng.choice(COUNTRIES)
                geo_rows.append(dup)  # duplicate ind
        if rng.random() < 0.9:
            jy = rng.randint(2015, 2022)
            first = rng.choice(FIRST_NAMES)
            if not dedup_safe and rng.random() < 0.02:
                first = None  # NULL-propagating concat edge
            user_rows.append(
                {
                    "ind": i,
                    "first_name": first,
                    "last_name": rng.choice(LAST_NAMES),
                    "age": rng.randint(16, 70),
                    "date_joined": f"{jy}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}T12:00:00",
                }
            )
            if not dedup_safe and rng.random() < 0.04:
                user_rows.append(dict(user_rows[-1]))  # duplicate ind
    # dangling geo/user keys (no pin) prove inner-join semantics
    for j in range(n_rows + 1, n_rows + 11):
        geo_rows.append(
            {"ind": j, "country": rng.choice(COUNTRIES), "latitude": 0.0, "longitude": 0.0,
             "timestamp": "2020-01-01T00:00:00"}
        )
        user_rows.append(
            {"ind": j, "first_name": "Zed", "last_name": "Zeta", "age": 30,
             "date_joined": "2020-01-01T00:00:00"}
        )

    pin_schema = pa.schema(
        [("index", pa.int32())] + [(c, pa.string()) for c in (
            "unique_id", "title", "description", "poster_name", "follower_count",
            "tag_list", "is_image_or_video", "image_src", "downloaded",
            "save_location", "category")]
    )
    geo_schema = pa.schema(
        [("ind", pa.int32()), ("country", pa.string()), ("latitude", pa.float32()),
         ("longitude", pa.float32()), ("timestamp", pa.string())]
    )
    user_schema = pa.schema(
        [("ind", pa.int32()), ("first_name", pa.string()), ("last_name", pa.string()),
         ("age", pa.int32()), ("date_joined", pa.string())]
    )
    return {
        "raw_pin": pa.Table.from_pylist(pin_rows, schema=pin_schema),
        "raw_geo": pa.Table.from_pylist(geo_rows, schema=geo_schema),
        "raw_user": pa.Table.from_pylist(user_rows, schema=user_schema),
    }


def write_fixtures(out_dir: str | Path, n_rows: int = 1000, seed: int = 42, dedup_safe: bool = False) -> dict[str, str]:
    """Write the three raw tables as parquet; return name -> path."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {}
    for name, table in generate_raw_tables(n_rows, seed, dedup_safe).items():
        p = out / f"{name}.parquet"
        pq.write_table(table, p)
        paths[name] = str(p)
    return paths


def write_fixtures_jsonl(
    out_dir: str | Path, n_rows: int = 1000, seed: int = 42, dedup_safe: bool = False
) -> dict[str, str]:
    """Write the three raw tables as JSON-line payload files (one dir per
    entity, the wire shape the streaming source consumes — one JSON
    object per record, cf. EMU:68-74). Returns entity -> dir path."""
    import json

    out = Path(out_dir)
    paths = {}
    for name, table in generate_raw_tables(n_rows, seed, dedup_safe).items():
        entity = name.removeprefix("raw_")
        d = out / entity
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "part-0000.jsonl", "w") as f:
            for row in table.to_pylist():
                f.write(json.dumps(row, default=str) + "\n")
        paths[entity] = str(d)
    return paths
