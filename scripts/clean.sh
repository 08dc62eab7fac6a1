#!/bin/bash
# Remove training outputs (reference scripts/clean.sh:1-5).
rm -rf ./saved_models ./logs
