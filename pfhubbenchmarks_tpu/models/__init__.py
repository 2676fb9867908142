from pfhubbenchmarks_tpu.models import forms as forms
