"""The reference README's customers/wishitems/catalog walkthrough
(littletable.py:64-95, README.md:132-160), on Spark.

Run: python examples/customers_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from littletable_spark import Table, get_spark


def main() -> None:
    spark = get_spark(cpus=4)

    customers = Table("customers", spark=spark)
    customers.create_index("id", unique=True)
    customers.insert_many(
        [
            {"id": "0010", "name": "George Jetson"},
            {"id": "0020", "name": "Wile E. Coyote"},
            {"id": "0030", "name": "Jonny Quest"},
        ]
    )

    catalog = Table("catalog", spark=spark)
    catalog.create_index("sku", unique=True)
    catalog.insert_many(
        [
            {"sku": "ANVIL-001", "descr": "1000lb anvil", "unitofmeas": "EA", "unitprice": 100},
            {"sku": "BRDSD-001", "descr": "bird seed", "unitofmeas": "LB", "unitprice": 3},
            {"sku": "MAGNT-001", "descr": "monster magnet", "unitofmeas": "EA", "unitprice": 1},
            {"sku": "MAGLS-001", "descr": "magnifying glass", "unitofmeas": "EA", "unitprice": 5},
        ]
    )

    wishitems = Table("wishitems", spark=spark)
    wishitems.insert_many(
        [
            {"custid": "0020", "sku": "ANVIL-001"},
            {"custid": "0020", "sku": "BRDSD-001"},
            {"custid": "0020", "sku": "MAGNT-001"},
            {"custid": "0030", "sku": "MAGNT-001"},
            {"custid": "0030", "sku": "MAGLS-001"},
        ]
    )

    # keyed access: one row or KeyError
    print("customer 0030:", customers.by.id["0030"].name)

    # the join DSL: customers +(id=custid) wishitems +(sku) catalog
    wishlists = (
        customers.join_on("id") + wishitems.join_on("custid") + catalog.join_on("sku")
    )()
    print("\nAll wishlists:")
    wishlists.select("name descr unitprice").orderby("name, unitprice desc").present()

    # filter with a comparator
    print("\nBig-ticket wishes (unitprice > 10):")
    wishlists.where(unitprice=Table.gt(10)).select("name descr unitprice").present()


if __name__ == "__main__":
    main()
