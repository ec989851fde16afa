"""The 7 Sakila catalog views + the film_text derived table (V2/V3, J11, A8).

Reference definitions: ``sql/sakila-schema.sql:348-470`` (views) and the
``film_text`` trigger family (``sql/sakila-schema.sql:213-236``). Each
builder takes the parsed-dump table dict
(:func:`..operators.sakila.load_reference_tables`) and returns a
DataFrame with the reference's column names.

Determinism policy for GROUP_CONCAT (A8): MySQL's un-ordered
``GROUP_CONCAT`` emits elements in whatever order the executor saw
them; we always sort (``array_sort`` before ``array_join``), and the
DuckDB parity twins in the tests use ``string_agg(... ORDER BY ...)``
to pin the same order. ``actor_info``'s nested ordered concat uses a
struct sort keyed on the category name, not on the rendered string, so
prefix-colliding names can never reorder entries.

Scale posture: every view is join + groupBy over the declared keys;
dims broadcast; ``collect_list`` aggregates are bounded by real-world
group sizes (actors per film ~tens). No Python UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _full_name(first, last) -> F.Column:
    """CONCAT(first_name, ' ', last_name) (``sql/sakila-schema.sql:353``)."""
    return F.concat_ws(" ", first, last)


def _nicer_name(col) -> F.Column:
    """UCASE(SUBSTR(x,1,1)) + LCASE(SUBSTR(x,2,LENGTH(x)))
    (``sql/sakila-schema.sql:379-381``)."""
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.lower(col.substr(F.lit(2), F.length(col))),
    )


def customer_list(t: dict[str, DataFrame]) -> DataFrame:
    """``customer_list`` (``sql/sakila-schema.sql:351-356``)."""
    cu, a = t["customer"], t["address"]
    ci, co = t["city"], t["country"]
    return (
        cu.join(F.broadcast(a), cu.address_id == a.address_id)
        .join(F.broadcast(ci), a.city_id == ci.city_id)
        .join(F.broadcast(co), ci.country_id == co.country_id)
        .select(
            cu.customer_id.alias("ID"),
            _full_name(cu.first_name, cu.last_name).alias("name"),
            a.address.alias("address"),
            a.postal_code.alias("zip code"),
            a.phone.alias("phone"),
            ci.city.alias("city"),
            co.country.alias("country"),
            F.when(cu.active, F.lit("active")).otherwise(F.lit("")).alias("notes"),
            cu.store_id.alias("SID"),
        )
    )


def staff_list(t: dict[str, DataFrame]) -> DataFrame:
    """``staff_list`` (``sql/sakila-schema.sql:392-397``)."""
    s, a = t["staff"], t["address"]
    ci, co = t["city"], t["country"]
    return (
        s.join(F.broadcast(a), s.address_id == a.address_id)
        .join(F.broadcast(ci), a.city_id == ci.city_id)
        .join(F.broadcast(co), ci.country_id == co.country_id)
        .select(
            s.staff_id.alias("ID"),
            _full_name(s.first_name, s.last_name).alias("name"),
            a.address.alias("address"),
            a.postal_code.alias("zip code"),
            a.phone.alias("phone"),
            ci.city.alias("city"),
            co.country.alias("country"),
            s.store_id.alias("SID"),
        )
    )


def _film_list_base(t: dict[str, DataFrame], actor_name) -> DataFrame:
    """Shared shape of ``film_list`` / ``nicer_but_slower_film_list``
    (``sql/sakila-schema.sql:362-370,376-386``): film left-joined to its
    categories and actors, grouped by (film, category), actors
    GROUP_CONCAT'd with ', '."""
    f, fc, c = t["film"], t["film_category"], t["category"]
    fa, a = t["film_actor"], t["actor"]
    joined = (
        f.join(F.broadcast(fc), f.film_id == fc.film_id, "left")
        .join(F.broadcast(c), fc.category_id == c.category_id, "left")
        .join(F.broadcast(fa), f.film_id == fa.film_id, "left")
        .join(F.broadcast(a), fa.actor_id == a.actor_id, "left")
    )
    grouped = joined.groupBy(
        f.film_id.alias("FID"),
        f.title.alias("title"),
        f.description.alias("description"),
        c.name.alias("category"),
        f.rental_rate.alias("price"),
        f.length.alias("length"),
        f.rating.alias("rating"),
    ).agg(
        # collect_list, not collect_set: MySQL GROUP_CONCAT keeps
        # duplicates (two same-named actors in one film both appear).
        F.array_join(
            F.array_sort(F.collect_list(actor_name(a))), ", "
        ).alias("actors")
    )
    # MySQL GROUP_CONCAT of zero rows is NULL, array_join of [] is "" —
    # restore NULL so films without actors match the reference.
    return grouped.withColumn(
        "actors", F.when(F.col("actors") == "", None).otherwise(F.col("actors"))
    )


def film_list(t: dict[str, DataFrame]) -> DataFrame:
    """``film_list`` (``sql/sakila-schema.sql:362-370``)."""
    return _film_list_base(t, lambda a: _full_name(a.first_name, a.last_name))


def nicer_but_slower_film_list(t: dict[str, DataFrame]) -> DataFrame:
    """``nicer_but_slower_film_list`` (``sql/sakila-schema.sql:376-386``):
    same as film_list with Xxxx-cased actor names."""
    return _film_list_base(
        t,
        lambda a: F.concat_ws(
            " ", _nicer_name(a.first_name), _nicer_name(a.last_name)
        ),
    )


def sales_by_store(t: dict[str, DataFrame]) -> DataFrame:
    """``sales_by_store`` (``sql/sakila-schema.sql:403-418``)."""
    p, r, i, s = t["payment"], t["rental"], t["inventory"], t["store"]
    a, ci, co, m = t["address"], t["city"], t["country"], t["staff"]
    return (
        p.join(r, p.rental_id == r.rental_id)
        .join(F.broadcast(i), r.inventory_id == i.inventory_id)
        .join(F.broadcast(s), i.store_id == s.store_id)
        .join(F.broadcast(a), s.address_id == a.address_id)
        .join(F.broadcast(ci), a.city_id == ci.city_id)
        .join(F.broadcast(co), ci.country_id == co.country_id)
        .join(F.broadcast(m), s.manager_staff_id == m.staff_id)
        .groupBy(
            s.store_id,
            ci.city,
            co.country,
            F.concat(ci.city, F.lit(","), co.country).alias("store"),
            _full_name(m.first_name, m.last_name).alias("manager"),
        )
        .agg(F.sum(p.amount).alias("total_sales"))
        .orderBy("country", "city")  # ORDER BY cy.country, c.city (:418)
        .select("store", "manager", "total_sales")
    )


def sales_by_film_category(t: dict[str, DataFrame]) -> DataFrame:
    """``sales_by_film_category`` (``sql/sakila-schema.sql:427-437``)."""
    p, r, i = t["payment"], t["rental"], t["inventory"]
    f, fc, c = t["film"], t["film_category"], t["category"]
    return (
        p.join(r, p.rental_id == r.rental_id)
        .join(F.broadcast(i), r.inventory_id == i.inventory_id)
        .join(F.broadcast(f), i.film_id == f.film_id)
        .join(F.broadcast(fc), f.film_id == fc.film_id)
        .join(F.broadcast(c), fc.category_id == c.category_id)
        .groupBy(c.name.alias("category"))
        .agg(F.sum(p.amount).alias("total_sales"))
        .orderBy(F.desc("total_sales"))
    )


def actor_info(t: dict[str, DataFrame]) -> DataFrame:
    """``actor_info`` (``sql/sakila-schema.sql:445-470``): per actor, a
    '; '-joined list of 'Category: film, film, ...' entries.

    The reference nests a correlated GROUP_CONCAT subquery (titles of
    that actor's films in that category, ordered by title) inside a
    DISTINCT ordered GROUP_CONCAT. Decorrelated: one aggregation per
    (actor, category) building the title list, then one per actor
    folding entries ordered by category name via a struct sort.
    """
    a, fa = t["actor"], t["film_actor"]
    fc, c, f = t["film_category"], t["category"], t["film"]

    per_cat = (
        fa.join(F.broadcast(fc), fa.film_id == fc.film_id)
        .join(F.broadcast(c), fc.category_id == c.category_id)
        .join(F.broadcast(f), fa.film_id == f.film_id)
        .groupBy(fa.actor_id.alias("ai_actor_id"), c.name.alias("cat_name"))
        .agg(
            F.array_join(F.array_sort(F.collect_list(f.title)), ", ").alias(
                "titles"
            )
        )
        .withColumn(
            "entry",
            F.struct(
                F.col("cat_name"),
                F.concat(F.col("cat_name"), F.lit(": "), F.col("titles")).alias(
                    "text"
                ),
            ),
        )
        .groupBy("ai_actor_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("entry")), lambda e: e.text
                ),
                "; ",
            ).alias("film_info")
        )
    )
    return (
        a.join(per_cat, a.actor_id == per_cat.ai_actor_id, "left")
        .select(a.actor_id, a.first_name, a.last_name, "film_info")
    )


def film_text_refresh(t: dict[str, DataFrame]) -> DataFrame:
    """V3: the ``film_text`` shadow table the reference maintains with
    INSERT/UPDATE/DELETE triggers (``sql/sakila-schema.sql:213-236``).
    Spark has no triggers — the same guarantee is a derived-table
    recomputation after each batch load (documented batch-refresh
    semantics)."""
    f = t["film"]
    return f.select("film_id", "title", "description")


#: view name → builder over the parsed-dump table dict.
SAKILA_VIEWS = {
    "customer_list": customer_list,
    "film_list": film_list,
    "nicer_but_slower_film_list": nicer_but_slower_film_list,
    "staff_list": staff_list,
    "sales_by_store": sales_by_store,
    "sales_by_film_category": sales_by_film_category,
    "actor_info": actor_info,
    "film_text": film_text_refresh,
}
