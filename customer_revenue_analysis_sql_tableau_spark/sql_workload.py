"""The warehouse workload as Spark SQL text (entry point A, SURVEY §3.1).

The reference IS a SQL script (``queries_shan.sql``); this module is its
Spark-SQL dialect: ``CREATE OR REPLACE TEMP VIEW customer_revenue_summary``
plus q1–q11 as SQL strings run through ``spark.sql``. Semantically
identical to the DataFrame builders in :mod:`.operators.sakila` (asserted
row-for-row in tests) — Catalyst compiles both to the same logical
algebra; which surface to use is caller's taste.

Dialect translation decisions (SURVEY §7.4):
- The correlated ``ORDER BY COUNT(*) DESC LIMIT 1`` subquery
  (``queries_shan.sql:15-23``) is not valid Spark SQL; rewritten with a
  window in a CTE, tie-break (count DESC, first rental ASC, name ASC) —
  the same policy the DataFrame builder pins against the goldens.
- ``DATEDIFF(a, b)`` → ``datediff(a, b)`` (same day-truncating
  semantics); ``DATE_FORMAT('%Y-%m')`` → ``date_format('yyyy-MM')``;
  ``CURDATE()`` → an injected anchor parameter.
- Money stays DECIMAL: ``0.50`` literals are cast, sums round HALF_UP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Spark-SQL dialect of ``queries_shan.sql:7-42`` (the analytical view).
VIEW_SQL = """
CREATE OR REPLACE TEMP VIEW customer_revenue_summary AS
WITH mfc AS (
    SELECT customer_id AS mfc_customer_id, name AS Most_Frequent_Category
    FROM (
        SELECT r2.customer_id, c2.name,
               row_number() OVER (
                   PARTITION BY r2.customer_id
                   ORDER BY count(*) DESC, min(r2.rental_id) ASC, c2.name ASC
               ) AS rn
        FROM rental r2
        JOIN inventory i2 ON r2.inventory_id = i2.inventory_id
        JOIN film_category fc2 ON i2.film_id = fc2.film_id
        JOIN category c2 ON fc2.category_id = c2.category_id
        GROUP BY r2.customer_id, c2.name
    ) WHERE rn = 1
),
grouped AS (
    SELECT
        c.customer_id AS Customer_ID,
        concat_ws(' ', c.first_name, c.last_name) AS Customer_Name,
        count(r.rental_id) AS Total_Rentals,
        round(sum(p.amount), 2) AS Total_Revenue,
        round(sum(p.amount) / count(r.rental_id), 2) AS Avg_Spending_Per_Rental,
        count(DISTINCT fc.category_id) AS Total_Categories_Rented,
        round(coalesce(sum(
            CASE WHEN datediff(r.return_date, r.rental_date) > f.rental_duration
                 THEN (datediff(r.return_date, r.rental_date) - f.rental_duration)
                      * CAST(0.50 AS DECIMAL(3,2))
                 ELSE CAST(0 AS DECIMAL(3,2)) END),
            CAST(0 AS DECIMAL(3,2))), 2) AS Total_Late_Fees,
        min(r.rental_date) AS First_Rental_Date,
        max(r.rental_date) AS Last_Rental_Date,
        count(p.payment_id) AS Total_Payments,
        ci.city AS Customer_City,
        co.country AS Customer_Country
    FROM customer c
    JOIN address a   ON c.address_id = a.address_id
    JOIN city ci     ON a.city_id = ci.city_id
    JOIN country co  ON ci.country_id = co.country_id
    JOIN rental r    ON c.customer_id = r.customer_id
    JOIN inventory i ON r.inventory_id = i.inventory_id
    JOIN film f      ON i.film_id = f.film_id
    LEFT JOIN payment p        ON r.rental_id = p.rental_id
    LEFT JOIN film_category fc ON i.film_id = fc.film_id
    GROUP BY c.customer_id, Customer_Name, ci.city, co.country
)
SELECT Customer_ID, Customer_Name, Total_Rentals, Total_Revenue,
       Avg_Spending_Per_Rental, Total_Categories_Rented,
       Most_Frequent_Category, Total_Late_Fees, First_Rental_Date,
       Last_Rental_Date, Total_Payments, Customer_City, Customer_Country
FROM grouped LEFT JOIN mfc ON grouped.Customer_ID = mfc.mfc_customer_id
"""

#: q1–q11 (``queries_shan.sql:46-144``) in Spark SQL. q5's CURDATE() is
#: the {anchor} parameter; q1 ships both the LIMIT form and the golden
#: (no-LIMIT) form.
QUERY_SQL: dict[str, str] = {
    "q1": """SELECT Customer_Name, Total_Revenue
             FROM customer_revenue_summary
             ORDER BY Total_Revenue DESC, Customer_Name ASC""",
    "q1_top10": """SELECT Customer_Name, Total_Revenue
             FROM customer_revenue_summary
             ORDER BY Total_Revenue DESC, Customer_Name ASC LIMIT 10""",
    "q2": """SELECT Customer_Name, Total_Rentals
             FROM customer_revenue_summary ORDER BY Total_Rentals DESC""",
    "q3": """SELECT Customer_Name, Total_Late_Fees
             FROM customer_revenue_summary ORDER BY Total_Late_Fees DESC""",
    "q4": """SELECT CASE WHEN Total_Rentals >= 20 THEN 'Frequent Renters'
                         WHEN Total_Rentals BETWEEN 10 AND 19 THEN 'Regular Renters'
                         ELSE 'Occasional Renters' END AS Rental_Frequency_Group,
                    count(Customer_ID) AS Customer_Count,
                    round(sum(Total_Revenue), 2) AS Total_Revenue
             FROM customer_revenue_summary
             GROUP BY 1 ORDER BY Total_Revenue DESC""",
    "q5": """SELECT Customer_Name, Last_Rental_Date
             FROM customer_revenue_summary
             WHERE Last_Rental_Date < add_months(DATE '{anchor}', -6)
             ORDER BY Last_Rental_Date ASC""",
    "q6": """SELECT Most_Frequent_Category,
                    count(Customer_ID) AS Customers_Who_Rent_This_Genre,
                    round(sum(Total_Revenue), 2) AS Total_Revenue
             FROM customer_revenue_summary
             GROUP BY 1 ORDER BY Total_Revenue DESC""",
    "q7": """SELECT Customer_Name, First_Rental_Date, Last_Rental_Date,
                    round(sum(Total_Revenue), 2) AS Lifetime_Spending
             FROM customer_revenue_summary
             GROUP BY 1, 2, 3 ORDER BY Lifetime_Spending DESC""",
    "q8": """SELECT date_format(First_Rental_Date, 'yyyy-MM') AS Customer_Cohort,
                    count(Customer_ID) AS New_Customers,
                    round(sum(Total_Revenue), 2) AS Total_Revenue
             FROM customer_revenue_summary
             GROUP BY 1 ORDER BY Customer_Cohort""",
    "q9": """SELECT Customer_Country AS Country,
                    count(Customer_ID) AS Total_Customers,
                    round(sum(Total_Revenue), 2) AS Total_Revenue
             FROM customer_revenue_summary
             GROUP BY 1 ORDER BY Total_Revenue DESC""",
    "q10": """SELECT Customer_City AS City, Customer_Country AS Country,
                     count(Customer_ID) AS Total_Customers,
                     round(sum(Total_Revenue), 2) AS Total_Revenue
              FROM customer_revenue_summary
              GROUP BY 1, 2 ORDER BY Total_Revenue DESC""",
    "q11": """SELECT Customer_Country AS Country,
                     count(Customer_ID) AS Total_Customers,
                     round(sum(Total_Revenue), 2) AS Total_Revenue,
                     round(sum(Total_Revenue) / count(Customer_ID), 2)
                         AS Avg_Revenue_Per_Customer
              FROM customer_revenue_summary
              GROUP BY 1 ORDER BY Avg_Revenue_Per_Customer DESC""",
}


def register_view_sql(spark: SparkSession) -> None:
    """Entry point A step 2 (SURVEY §3.1): DDL through ``spark.sql``.
    Requires the Sakila base tables as temp views
    (:func:`.operators.sakila.load_reference_tables` registers them)."""
    spark.sql(VIEW_SQL)


def run_query_sql(
    spark: SparkSession, name: str, anchor: str = "2007-01-01"
) -> DataFrame:
    """Run one of q1–q11 through ``spark.sql``."""
    return spark.sql(QUERY_SQL[name].format(anchor=anchor))
