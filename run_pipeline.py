"""spark-submit entrypoint shim.

spark-submit executes the script as __main__ with no package context, so the
package entrypoint must be imported absolutely:

    zip -r insights_spark.zip insights_spark
    spark-submit --py-files insights_spark.zip run_pipeline.py --out /path/wh

(`python -m insights_spark.jobs.pipeline` works too when the package is on
PYTHONPATH.)
"""

from insights_spark.jobs.pipeline import main

if __name__ == "__main__":
    main()
