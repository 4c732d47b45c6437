#!/bin/bash
# Fetch and preprocess the standard benchmark datasets. Datasets and
# mirrors follow the upstream LibKGE distribution
# (https://github.com/uma-pi1/kge, data/download_all.sh); preprocessing
# uses this repo's pipeline.
set -e
BASEDIR=$(cd "$(dirname "$0")" && pwd)
PY=${PYTHON:-python}

fetch_zip() { # name url [preprocess_script]
  local name=$1 url=$2 script=${3:-preprocess_default.py}
  if [ -d "$BASEDIR/$name" ] && [ -f "$BASEDIR/$name/dataset.yaml" ]; then
    echo "$name already present; skipping"
    return
  fi
  echo "Downloading $name..."
  mkdir -p "$BASEDIR/$name"
  curl -L "$url" -o "$BASEDIR/$name.tgz"
  tar xzf "$BASEDIR/$name.tgz" -C "$BASEDIR"
  rm -f "$BASEDIR/$name.tgz"
  $PY "$BASEDIR/preprocess/$script" "$BASEDIR/$name"
}

MIRROR="https://web.informatik.uni-mannheim.de/pi1/kge-datasets"

fetch_zip toy        $MIRROR/toy.tar.gz
fetch_zip fb15k      $MIRROR/fb15k.tar.gz
fetch_zip fb15k-237  $MIRROR/fb15k-237.tar.gz
fetch_zip wn18       $MIRROR/wn18.tar.gz
fetch_zip wnrr       $MIRROR/wnrr.tar.gz
fetch_zip wn11       $MIRROR/wn11.tar.gz preprocess_wn11.py
fetch_zip dbpedia50  $MIRROR/dbpedia50.tar.gz
fetch_zip dbpedia500 $MIRROR/dbpedia500.tar.gz
fetch_zip db100k     $MIRROR/db100k.tar.gz
fetch_zip yago3-10   $MIRROR/yago3-10.tar.gz
fetch_zip wikidata5m $MIRROR/wikidata5m.tar.gz
fetch_zip kinship    $MIRROR/kinship.tar.gz
fetch_zip nations    $MIRROR/nations.tar.gz
fetch_zip umls       $MIRROR/umls.tar.gz
fetch_zip codex-s    $MIRROR/codex-s.tar.gz
fetch_zip codex-m    $MIRROR/codex-m.tar.gz
fetch_zip codex-l    $MIRROR/codex-l.tar.gz
