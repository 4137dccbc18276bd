#!/usr/bin/env python
"""Challenge submission packer (reference tools/submit_results.py:1-41).

Wraps a results file with team metadata into the submission pkl format.
"""

import argparse
import json
import pickle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--results', required=True,
                        help='json/pkl of per-sample predictions')
    parser.add_argument('--out', required=True, help='output pkl path')
    parser.add_argument('--method', default='embodiedscan-tpu')
    parser.add_argument('--team', default='')
    parser.add_argument('--authors', default='')
    parser.add_argument('--email', default='')
    parser.add_argument('--institution', default='')
    parser.add_argument('--country', default='')
    args = parser.parse_args()

    if args.results.endswith('.json'):
        with open(args.results) as f:
            results = json.load(f)
    else:
        with open(args.results, 'rb') as f:
            results = pickle.load(f)

    submission = dict(
        method=args.method,
        team=args.team,
        authors=args.authors.split(',') if args.authors else [],
        e_mail=args.email,
        institution_or_company=args.institution,
        country_or_region=args.country,
        results=results,
    )
    with open(args.out, 'wb') as f:
        pickle.dump(submission, f)
    print(f'wrote {args.out} ({len(results)} entries)')


if __name__ == '__main__':
    main()
