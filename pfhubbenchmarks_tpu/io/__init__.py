from pfhubbenchmarks_tpu.io.csvout import write_csv as write_csv
