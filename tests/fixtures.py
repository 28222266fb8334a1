"""Reference-shaped CSV fixtures (FIXTURES.md §1) — deterministic, tiny.

Recreates every semantics-bearing quirk profiled from the reference data
(SURVEY.md §1.4): duplicate (orderId, productId) pairs identical except
dateTime, quoted-empty campaigns, minute-precision timestamps, composite
product ids, inventory skewed to low stock, partial order coverage.
"""

from __future__ import annotations

import os
import random

ORDERS_HEADER = "orderId,productId,currency,quantity,shippingCost,amount,channel,channelGroup,campaign,dateTime"
INVENTORY_HEADER = "productId,name,quantity,category,subCategory"

CHANNELS = ["direct", "google", "others", "facebook", "bing", "newsletter", "instagram"]
GROUPS = ["sem", "direct", "referral", "organic", "email", "social_ppc", "social_organic", "affiliate"]
CAMPAIGNS = ["kr_pmax", "se_branded_search", "dk_shopping", "fi_display"]
CATEGORIES = ["Shoes", "Clothing", "Accessories"]
SUBCATS = ["Sneakers", "Boots", "T-shirts", "Jackets", "Belts", "Hats"]


def product_id(rng: random.Random) -> str:
    return f"prod{rng.randint(1000, 9999)}#prod{rng.randint(10**11, 10**12 - 1)}"


def write_fixture_csvs(dirpath: str, n_products: int = 40, n_orders: int = 120, seed: int = 7):
    """Returns (orders_csv_path, inventory_csv_path)."""
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)

    products = [product_id(rng) for _ in range(n_products)]

    inv_path = os.path.join(dirpath, "inventory.csv")
    with open(inv_path, "w") as f:
        f.write(INVENTORY_HEADER + "\n")
        for i, pid in enumerate(products):
            qty = rng.randint(0, 9) if rng.random() < 0.8 else rng.randint(10, 525)
            f.write(
                f'{pid},Product {i},{qty},{rng.choice(CATEGORIES)},{rng.choice(SUBCATS)}\n'
            )

    orders_path = os.path.join(dirpath, "orders.csv")
    rows = []
    # ~28% of products get orders (FIXTURES.md §1.2 join shape)
    ordered_products = products[: max(1, int(n_products * 0.28))]
    for i in range(n_orders):
        oid = f"00000000-0000-0000-0000-{i:012d}"
        pid = rng.choice(ordered_products)
        qty = rng.randint(1, 3)
        ship = round(rng.uniform(0, 2200), 2) if rng.random() > 0.5 else 0
        amount = round(rng.uniform(179, 25252), 3)
        campaign = rng.choice(CAMPAIGNS) if rng.random() > 0.65 else ""
        base_minute = rng.randint(0, 59)
        # ~80% duplicate multiplicity: same key re-exported at later times,
        # identical in every column except dateTime (SURVEY.md §1.4.1)
        n_dups = rng.choice([1, 1, 2, 3, 8])
        for d in range(n_dups):
            if rng.random() < 0.02:  # minute-precision rows (§1.4.2)
                ts = f"2023-0{rng.randint(2, 5)}-01T06:{base_minute + d:02d}Z"
            else:
                ts = f"2023-0{rng.randint(2, 5)}-{rng.randint(1, 28):02d}T17:{base_minute:02d}:{d:02d}Z"
            rows.append(
                f'{oid},{pid},SEK,{qty},{ship},{amount},{rng.choice(CHANNELS)},'
                f'{rng.choice(GROUPS)},"{campaign}",{ts}'
            )
    with open(orders_path, "w") as f:
        f.write(ORDERS_HEADER + "\n")
        f.write("\n".join(rows) + "\n")
    return orders_path, inv_path
