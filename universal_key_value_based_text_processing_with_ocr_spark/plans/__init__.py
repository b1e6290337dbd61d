"""Pipeline assembly: partitioning/salting policy and the end-to-end job."""

from .partitioning import salted_repartition, host_of_url
from .pipeline import rebuild_fp_table, run_extraction_job
